#!/usr/bin/env python
"""Train + commit the small weights the headline bench loads.

Trains the CNN family (ResNet-18 trunk + temporal head, the headline
pipeline's model) at the full 63-class operating point on the
DEVICE-SIDE synthetic generator (train/device_synth.py — the sprite
compositing runs on the chip, so the 1-core host no longer caps
training), then converts to the pipeline's split {embed, head} trees and
saves them float16 to ``playaid_core_tpu/assets/bench_cnn63.npz`` for
``bench.load_bench_weights``.

Holdout honesty: training sprites use variant seeds 0-4; the bench
fixture renders the capstone's held-out variant 17, so in-bench label
agreement measures generalization, not memorization.

    python tools/train_bench_weights.py <workdir> [--epochs 40]
"""

import os
import sys

import click
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build_assets(workdir):
    """Sprite sets (train variants) + stage textures, idempotent."""
    import cv2

    from playaid_core_tpu.datagen import skeletal_sprites as sk

    clean = os.path.join(workdir, "clean")
    stages = os.path.join(workdir, "stages")
    os.makedirs(stages, exist_ok=True)
    if not os.path.isdir(clean):
        print("generating skeletal sprite sets (train variants 0-4)...")
        offsets = {v: (k % 3) / 3.0 for k, v in enumerate((0, 1, 2, 3, 4))}
        n = sk.generate_sprite_set(
            clean, fighters=list(sk.FIGHTER_STYLES),
            moves=sk.MOVES + sk.EXTRA_MOVES, frames_per_move=16,
            variant_seeds=(0, 1, 2, 3, 4), phase_offsets=offsets,
        )
        print(f"  {n} sprites")
    rng = np.random.default_rng(0)
    specs = [
        ("noise_dark", lambda r: r.integers(0, 60, (540, 960, 3))),
        ("noise_mid", lambda r: r.integers(0, 140, (540, 960, 3))),
        ("bands", lambda r: np.repeat(
            r.integers(0, 160, (54, 960, 3)), 10, axis=0)),
        ("tiles", lambda r: np.kron(
            r.integers(0, 170, (18, 32, 3)), np.ones((30, 30, 1)))),
    ]
    for name, fn in specs:
        p = os.path.join(stages, f"{name}.jpg")
        if not os.path.exists(p):
            cv2.imwrite(p, fn(rng).astype(np.uint8))
    return clean, stages


@click.command()
@click.argument("workdir")
@click.option("--epochs", default=40, type=int)
@click.option("--steps", default=75, type=int, help="steps per epoch")
@click.option("--batch", default=16, type=int)
@click.option("--out", default=None, help="npz output (default: the committed asset)")
@click.option("--eval-fixture/--no-eval-fixture", default=True,
              help="self-check label agreement on a bench-style fixture")
def main(workdir, epochs, steps, batch, out, eval_fixture):
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    try:
        warm_tunnel(log=print)
    except RuntimeError as e:
        print(f"tunnel warm-up failed ({e}); proceeding")

    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from playaid_core_tpu.datagen import skeletal_sprites as sk
    from playaid_core_tpu.ontology import MOVE_TO_CLASS_ID
    from playaid_core_tpu.train.device_synth import DeviceSynthDataset
    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    os.makedirs(workdir, exist_ok=True)
    clean, stages = build_assets(workdir)
    actions = list(MOVE_TO_CLASS_ID.keys())  # label id == pipeline class id

    ds = DeviceSynthDataset(
        anim_subset=actions, characters=list(sk.FIGHTER_STYLES),
        clean_char_dir=clean, stages_dir=stages,
        num_samples=steps * batch, num_frames_per_sample=7,
        synth_sprite_fill=(0.70, 0.98), synth_center_jitter=10,
        synth_frame_degrade=0.5, synth_window="middleout",
        synth_cycle_repeats=(1, 2), synth_difficulty=1, seed=0,
    )
    print(f"sprite bank: {ds.sprites.num_sprites} sprites "
          f"({ds.sprites.nbytes / 1e9:.2f} GB), "
          f"{ds.stages.num_patches} stage patches")

    config = TrainerConfig(
        family="cnn", num_actions=len(actions), sequence_length=7,
        batch_size=batch, learning_rate=3e-4, num_samples=steps * batch,
        crop_size=128, curriculum_threshold=0.88, dtype=jnp.bfloat16,
        lr_decay_steps=epochs * steps, verbose=True,
    )
    trainer = Trainer(config, ds)
    trainer.init_state()
    trainer.fit(num_epochs=epochs, steps_per_epoch=steps)
    sps = sorted(r.get("steps_per_sec", 0) for r in trainer.metrics_log)
    print(f"train throughput: median {sps[len(sps) // 2]:.1f} steps/s "
          f"(epoch accs tail: "
          f"{[round(r['train_acc'], 3) for r in trainer.metrics_log[-5:]]})")

    # Convert to the pipeline's split trees and save float16.
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline

    pipe = BatchedActionPipeline(family="cnn", num_actions=len(actions),
                                 sequence_length=7, frame_delta=3)
    variables = pipe.from_monolithic({
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    })
    flat = flatten_dict(variables)
    out = out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "playaid_core_tpu", "assets", "bench_cnn63.npz",
    )
    np.savez_compressed(
        out, **{"/".join(k): np.asarray(v, np.float16) for k, v in flat.items()}
    )
    print(f"saved {out} ({os.path.getsize(out) / 1e6:.1f} MB)")

    if eval_fixture:
        import tempfile

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import SEGMENT_FRAMES, load_bench_weights, make_sprite_video
        from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer

        fixture = os.path.join(tempfile.gettempdir(), "bench_weights_check.mp4")
        boxes, gt = make_sprite_video(fixture, 600)
        an = VodAnalyzer(pipe, variables=load_bench_weights(pipe),
                         chunk=48, host_resize=True, lowres="auto", stride=2)
        r = an.analyze(fixture, boxes)
        pos = np.arange(600) % SEGMENT_FRAMES
        interior = (pos >= 12) & (pos < SEGMENT_FRAMES - 12)
        agree = (r["labels"][:600] == gt[:600])[interior].mean()
        print(f"fixture label agreement (interior, held-out variant): "
              f"{agree:.4f}")


if __name__ == "__main__":
    main()

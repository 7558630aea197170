"""playaid_core_tpu — TPU-native gameplay-video analytics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
Smash Ultimate analytics engine (NathanBWaters/playaid_core): log-driven
match analytics (timeline -> fighter state machine -> stats -> annotated
video) plus a pixels-only AI path (detection -> batched TPU action
recognition -> OCR) and the full training stack (datasets, synthetic data
generation, Flax model families, pjit data-parallel training).

Layering (mirrors reference SURVEY §1):
  L0 game data      playaid_core_tpu.{constants,ontology,frame_data}
  L1 entity/state   playaid_core_tpu.{geometry,fighter}
  L2 timeline       playaid_core_tpu.timeline
  L3 analytics      playaid_core_tpu.stats
  L4 rendering      playaid_core_tpu.render.*
  L5 ML             playaid_core_tpu.{models,train,ops,parallel}.*
  L6 pipeline/CLI   playaid_core_tpu.{pipeline,infer,datagen}.*
"""

__version__ = "0.1.0"

"""TPU tunnel warm-up: clear session staleness before real device work.

On tunneled-device hosts, after ~10 minutes of device idleness (or a
back-to-back session handoff) the FIRST client process to touch the TPU
can wedge forever (all threads parked in futex) — but killing it and
dialing again from a fresh process succeeds immediately.  The workaround
is to probe via a short-timeout subprocess: a timed-out probe is itself
the sacrifice that unwedges the tunnel for the next attempt.

Call :func:`warm_tunnel` at the top of any long-running TPU entry point
(bench.py, the capstone drivers) BEFORE the process's own first device
touch.  No-op cost when the tunnel is healthy: one tiny subprocess
(~2-80 s depending on backend init).
"""

from __future__ import annotations

import subprocess
import sys
import time


def warm_tunnel(attempts: int = 5, probe_timeout: float = 120.0,
                cooldown: float = 90.0, log=print) -> bool:
    """Probe the device backend from throwaway subprocesses until one
    succeeds.  Returns True on success; raises RuntimeError after
    ``attempts`` failed probes.

    ``cooldown`` is the quiet window after a dead client before the next
    dial — immediate redials wedge again.
    """
    probe = ("import jax, jax.numpy as jnp;"
             "print(float(jnp.zeros((2,)).sum()))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return True
            log(f"tunnel probe {i + 1} exited rc={r.returncode}; retrying...")
        except subprocess.TimeoutExpired:
            log(f"tunnel probe {i + 1} timed out (stale session cleared); "
                f"retrying after cleanup window...")
        if i + 1 < attempts:  # no point cooling down before the raise
            time.sleep(cooldown)
    raise RuntimeError("TPU tunnel did not recover after probes")

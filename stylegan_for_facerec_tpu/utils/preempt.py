"""Preemption handling (beyond reference — TPU pods get preempted; the
reference's recovery story is manual restart from the last per-epoch save,
``train.py:206-232``).

``install_preemption_handler()`` turns SIGTERM/SIGINT into a
``threading.Event`` instead of a KeyboardInterrupt, so a training loop can
finish the in-flight step, write an emergency checkpoint tagged
``preempted: True``, and exit 0 — the scheduler then restarts the job with
``--resume`` and it continues from the saved step. All four training CLIs
(``tools/train_stage{1,2,3}.py``, ``tools/train_stage2_e4e.py``) use this.
"""

from __future__ import annotations

import signal
import threading


def install_preemption_handler(
        signals=(signal.SIGTERM, signal.SIGINT)) -> threading.Event:
    """Install signal handlers that set (and return) a stop event.

    The loop checks ``stop.is_set()`` once per step; the handler never
    raises, so JAX dispatch in flight is never torn mid-call.
    """
    stop = threading.Event()

    def _on_signal(signum, frame):
        print(f"[preempt] caught signal {signum}; checkpointing after the "
              "in-flight step", flush=True)
        stop.set()

    for s in signals:
        signal.signal(s, _on_signal)
    return stop

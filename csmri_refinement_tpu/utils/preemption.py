"""Cooperative preemption: SIGTERM → checkpoint at the epoch boundary → exit.

The reference's only interruption handling is a KeyboardInterrupt catch
that closes the TensorBoard writer (/root/reference/train.py:450-452);
recovery is manual ``--resume``. TPU pools are preemptible — the scheduler
sends SIGTERM with a grace window — so the trainer here turns that signal
into a clean resumable exit: the handler only sets a flag (async-signal
safe; a mid-step save could capture device state mid-update, and Python
handlers cannot interrupt C-level PJRT calls anyway — NOTES.md round 4),
and ``train_net`` checks the flag at each epoch boundary, saves a periodic
checkpoint, and returns. Resuming with ``--resume`` continues at the next
epoch exactly as after a planned stop.

Multi-host note: preemption signals every process of a job; the flag is
per-process and checkpoint writes stay gated on process 0
(train.py ``_is_writer_process``).
"""

import logging
import signal
import threading

_requested = threading.Event()

#: Signals treated as a preemption notice. SIGTERM is what cluster
#: schedulers send; SIGINT stays a KeyboardInterrupt (immediate stop,
#: reference behavior).
SIGNALS = (signal.SIGTERM,)


def requested():
  """True once a preemption signal arrived."""
  return _requested.is_set()


def request(signum=None, frame=None):
  """Flag a preemption (signal handler; callable directly from tests)."""
  logging.warning('Preemption requested (signal %s): will checkpoint and '
                  'stop at the next epoch boundary', signum)
  _requested.set()


def reset():
  _requested.clear()


def install():
  """Install the handler; returns {signal: previous handler} for tests.

  No-op (returns {}) off the main thread, where CPython forbids
  signal.signal.
  """
  previous = {}
  for sig in SIGNALS:
    try:
      previous[sig] = signal.signal(sig, request)
    except ValueError:  # not the main thread
      logging.debug('Not installing preemption handler for %s '
                    '(non-main thread)', sig)
  return previous

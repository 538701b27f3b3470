"""Console + per-run-dir file logging (reference utils/logging.py:10-20)."""

import logging
import os
import sys


def setup_logging(run_dir=None, mode='train', time_string=None, verbose=False):
  """Configure root logger with a stream handler and optional run-dir file.

  Log files are named ``log_{mode}_{time}.txt`` inside the run dir, matching
  the reference's checkpoint_paths naming (utils/checkpoint_paths.py:12,66-67).
  """
  root = logging.getLogger()
  root.setLevel(logging.DEBUG if verbose else logging.INFO)
  # Drop pre-existing handlers so repeated setup (tests, notebooks) is clean.
  for handler in list(root.handlers):
    root.removeHandler(handler)

  fmt = logging.Formatter('%(asctime)s %(levelname)s: %(message)s',
                          datefmt='%Y-%m-%d %H:%M:%S')
  stream = logging.StreamHandler(sys.stdout)
  stream.setFormatter(fmt)
  root.addHandler(stream)

  if run_dir is not None:
    os.makedirs(run_dir, exist_ok=True)
    name = 'log_{}_{}.txt'.format(mode, time_string) if time_string \
        else 'log_{}.txt'.format(mode)
    file_handler = logging.FileHandler(os.path.join(run_dir, name))
    file_handler.setFormatter(fmt)
    root.addHandler(file_handler)

  return root

"""Runner registry (reference /root/reference/training/__init__.py:6-17).

Only ``standard`` and ``adversarial`` exist — the reference also declared
``multitask`` runners whose modules never existed (SURVEY.md §7 quirks).
"""

import importlib

RUNNER_MODULES = {
    'standard': 'runner',
    'adversarial': 'adversarial_runner',
}


def build_runner(conf, runner_type, mode):
  assert runner_type in RUNNER_MODULES, \
      'Unknown runner type {}'.format(runner_type)
  module = importlib.import_module(
      'csmri_refinement_tpu.training.' + RUNNER_MODULES[runner_type])
  return module.build_runner(conf, mode=mode)

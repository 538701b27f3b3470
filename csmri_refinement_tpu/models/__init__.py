"""Model registry (reference /root/reference/models/__init__.py:3-17).

``construct_model(conf, name)`` dispatches to the model module's
``construct_model`` which binds config attributes to the flax module's
constructor via ``conf.to_param_dict``. Each model class carries an
``INPUT_KEYS`` tuple naming the batch-dict entries its ``__call__`` takes —
the explicit replacement for the reference's forward-signature inspection
(training/base_runner.py:43-63).
"""

import importlib

MODEL_MODULES = {
    'UNET': 'unet',
    'CNNDiscriminator': 'discriminators',
    'RecNet': 'recnet',
    'RefinementWrapper': 'refinement_wrapper',
}


def construct_model(conf, model_name, **kwargs):
  assert model_name in MODEL_MODULES, 'Unknown model {}'.format(model_name)
  module_name = MODEL_MODULES[model_name]
  module = importlib.import_module(
      'csmri_refinement_tpu.models.' + module_name)
  return module.construct_model(conf, model_name, **kwargs)


def get_input_keys(model):
  """Batch keys the model's __call__ consumes, in order."""
  return getattr(model, 'INPUT_KEYS', ('inp',))

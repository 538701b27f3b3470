"""Config system tests: includes, overrides, param binding.

Covers the reference behaviors at utils/config.py:7-33 (#include),
233-248 (keyed include), 108-149 (typed CLI overrides), 151-184
(to_param_dict).
"""

import json
import os

from csmri_refinement_tpu.utils.config import Configuration


def _write(tmp_path, name, obj):
  path = os.path.join(str(tmp_path), name)
  with open(path, 'w') as f:
    json.dump(obj, f)
  return path


def test_from_json_basic(tmp_path):
  path = _write(tmp_path, 'a.json', {'seed': 7, 'run_name': 'x',
                                     'model': {'name': 'RecNet'}})
  conf = Configuration.from_json(path)
  assert conf.seed == 7
  assert conf.run_name == 'x'
  assert conf.model['name'] == 'RecNet'
  assert conf.file == path


def test_hash_include_local_wins(tmp_path):
  _write(tmp_path, 'base.json', {'a': 1, 'b': 2})
  path = _write(tmp_path, 'main.json', {'#include': 'base.json', 'b': 3})
  conf = Configuration.from_json(path)
  assert conf.a == 1
  assert conf.b == 3


def test_nested_hash_include(tmp_path):
  _write(tmp_path, 'model.json', {'name': 'UNET', 'use_bn': True})
  path = _write(tmp_path, 'main.json',
                {'model': {'#include': 'model.json', 'use_bn': False}})
  conf = Configuration.from_json(path)
  assert conf.model == {'name': 'UNET', 'use_bn': False}


def test_keyed_include(tmp_path):
  _write(tmp_path, 'segscore.json', {'name': 'UNET', 'num_inputs': 2})
  path = _write(tmp_path, 'main.json',
                {'include': {'segmodel': 'segscore.json'},
                 'segmodel': {'num_inputs': 4}})
  conf = Configuration.from_json(path)
  # Pre-existing dict values override the included file's values.
  assert conf.segmodel['name'] == 'UNET'
  assert conf.segmodel['num_inputs'] == 4


def test_update_typed_conversion():
  conf = Configuration.from_dict({'lr': 0.1})
  conf.update({'lr': '0.0002', 'epochs': '10', 'flag': 'True',
               'names': '[a, b]', 'sizes': '[1, 2]', 'seed': '3',
               'text': 'hello'})
  assert conf.lr == 0.0002
  assert conf.epochs == 10
  assert conf.flag is True
  assert conf.names == ['a', 'b']
  assert conf.sizes == [1, 2]
  assert conf.seed == 3
  assert conf.text == 'hello'


def test_to_param_dict():
  conf = Configuration.from_dict(
      {'num_blocks': 3, 'kernel_size': 5, 'pretrained_model': {'a': 1}})
  params = conf.to_param_dict(
      ['num_blocks'], ['kernel_size', 'missing'],
      {'pretrained_model': 'pretrained_model_conf'})
  assert params == {'num_blocks': 3, 'kernel_size': 5}

  params = conf.to_param_dict(
      ['pretrained_model'], {}, {'pretrained_model': 'pretrained_model_conf'})
  assert params == {'pretrained_model_conf': {'a': 1}}


def test_to_param_dict_optional_defaults():
  conf = Configuration.from_dict({})
  params = conf.to_param_dict([], {'alpha': 0.99})
  assert params == {'alpha': 0.99}


def test_get_attr_alternative():
  conf = Configuration.from_dict({'validation_batch_size': 4})
  assert conf.get_attr('batch_size', alternative='validation_batch_size') == 4


def test_child_inherits_seed(tmp_path):
  path = _write(tmp_path, 'a.json', {'seed': 9, 'model': {'name': 'RecNet'}})
  conf = Configuration.from_json(path)
  child = Configuration.from_dict(conf.model, conf)
  assert child.seed == 9
  assert child.file == path


def test_serialize_roundtrip(tmp_path):
  path = _write(tmp_path, 'a.json', {'seed': 5, 'x': [1, 2]})
  conf = Configuration.from_json(path)
  dst = os.path.join(str(tmp_path), 'out.json')
  conf.serialize(dst)
  with open(dst) as f:
    data = json.load(f)
  assert data['_seed'] == 5
  assert data['x'] == [1, 2]

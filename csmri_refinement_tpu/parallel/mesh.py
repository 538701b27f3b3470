"""Device mesh construction and sharding helpers."""

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(num_devices=None, devices=None, axis_name=DATA_AXIS):
  """1-D data-parallel mesh over the first ``num_devices`` devices."""
  if devices is None:
    devices = jax.devices()
  if num_devices is not None:
    assert num_devices <= len(devices), \
        'Requested {} devices but only {} available'.format(
            num_devices, len(devices))
    devices = devices[:num_devices]
  return Mesh(np.array(devices), (axis_name,))


def mesh_from_conf(conf):
  """Build a mesh from the config's ``mesh`` section, or None.

  ``{"data": -1}`` means all visible devices; ``{"data": N}`` exactly N.
  """
  mesh_conf = conf.get_attr('mesh', default=None)
  if not mesh_conf:
    return None
  n = mesh_conf.get(DATA_AXIS, -1)
  n = None if n in (-1, 0) else int(n)
  mesh = make_mesh(n)
  logging.info('Using %d-device data-parallel mesh', mesh.size)
  return mesh


def shard_batch(batch, mesh):
  """Place a batch pytree with the leading axis sharded over ``data``."""
  if mesh is None:
    return batch
  sharding = NamedSharding(mesh, P(DATA_AXIS))
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batch(batch, mesh):
  """Place a (steps, batch, ...) stacked pytree with axis 1 sharded over
  ``data`` (the scan axis stays unsharded) — the steps_per_fetch
  throughput mode's input layout."""
  if mesh is None:
    return batch
  sharding = NamedSharding(mesh, P(None, DATA_AXIS))
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh):
  """Replicate a pytree (params/opt state) across the mesh."""
  if mesh is None:
    return tree
  sharding = NamedSharding(mesh, P())
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding) if hasattr(x, 'shape') else x,
      tree)

"""Device mesh construction and sharding helpers.

Rebuilds the role of the reference's single-node ``CustomDataParallel``
(`/root/reference/utils/__init__.py:113-127`) as GSPMD sharding over a
`jax.sharding.Mesh`. Two mesh axes are supported:

* ``data`` — batch axis sharding (the reference's only parallelism).
* ``spatial`` — image-row (H) sharding on top of data parallelism. Pure
  annotation: GSPMD inserts the halo exchanges for the SAME-padded convs
  and the collectives for the DC k-space GEMMs (whose H-axis transform is
  inherently global). This is what lets one logical batch element span
  several chips — e.g. full-resolution 512² inference at small batch, or
  images whose activations exceed one chip's HBM.

Parameters and optimizer state are replicated (conv nets: the weight
footprint is tiny next to activations); batches shard over ``data`` and,
for image-like leaves, ``spatial``.
"""

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
SPATIAL_AXIS = 'spatial'


def make_mesh(num_devices=None, devices=None, axis_name=DATA_AXIS,
              spatial=1):
  """Device mesh over the first ``num_devices`` devices.

  ``spatial=1`` (default) gives the 1-D data-parallel mesh; ``spatial=S``
  folds the device list into a (num_devices // S, S) grid with axes
  (``data``, ``spatial``).
  """
  if devices is None:
    devices = jax.devices()
  if num_devices is not None:
    assert num_devices <= len(devices), \
        'Requested {} devices but only {} available'.format(
            num_devices, len(devices))
    devices = devices[:num_devices]
  spatial = int(spatial) if spatial else 1
  if spatial > 1:
    assert len(devices) % spatial == 0, \
        'spatial={} does not divide {} devices'.format(spatial,
                                                       len(devices))
    grid = np.array(devices).reshape(len(devices) // spatial, spatial)
    return Mesh(grid, (axis_name, SPATIAL_AXIS))
  return Mesh(np.array(devices), (axis_name,))


def mesh_from_conf(conf):
  """Build a mesh from the config's ``mesh`` section, or None.

  ``{"data": -1}`` means all visible devices; ``{"data": N}`` exactly N
  data-parallel groups. ``{"data": N, "spatial": S}`` uses N*S devices
  with image rows sharded S-way inside each data-parallel group.
  """
  from csmri_refinement_tpu.ops import dc
  mesh_conf = conf.get_attr('mesh', default=None)
  if not mesh_conf:
    # Clear the process-global spatial-DC flag even on the no-mesh path:
    # a prior spatial-mesh runner in the same process must not leak its
    # forced GEMM DC lowering into this mesh-less runner (ADVICE r3).
    dc.set_spatial_mesh(False)
    return None
  spatial = int(mesh_conf.get(SPATIAL_AXIS, 1) or 1)
  n = mesh_conf.get(DATA_AXIS, -1)
  if n in (-1, 0, None):
    n = len(jax.devices()) // spatial * spatial
  else:
    n = int(n) * spatial
  mesh = make_mesh(n, spatial=spatial)
  # FFT HLOs cannot be partitioned over image rows on XLA:CPU; the GEMM
  # DC lowering shards cleanly on every backend. Set unconditionally so a
  # later 1-D mesh in the same process clears the flag (ADVICE r3).
  dc.set_spatial_mesh(spatial > 1)
  if spatial > 1:
    logging.info('Using %dx%d data x spatial device mesh',
                 mesh.shape[DATA_AXIS], spatial)
  else:
    logging.info('Using %d-device data-parallel mesh', mesh.size)
  return mesh


def multiprocess():
  """True in a multi-controller run (jax.distributed initialized with more
  than one process) — the mesh then spans devices this process cannot
  address, and host data must enter through
  ``jax.make_array_from_process_local_data``."""
  return jax.process_count() > 1


def _put(x, mesh, spec):
  """Place one leaf under a NamedSharding, multi-process aware.

  Single-process: plain ``jax.device_put``. Multi-process: host values are
  this process's *local* portion of the global array (e.g. the local batch
  slice from ``DataLoader(process_shard=...)``) and are lifted with
  ``make_array_from_process_local_data``; arrays that are already global
  (jit outputs) are resharded with ``device_put``, which is legal for
  committed global arrays."""
  sharding = NamedSharding(mesh, spec)
  if multiprocess():
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
      return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
  return jax.device_put(x, sharding)


def _batch_spec(x, mesh, lead=()):
  """PartitionSpec for one batch leaf: batch axis over ``data``; the H
  axis of image-like leaves (ndim >= 3 after the lead axes) additionally
  over ``spatial``."""
  lead = tuple(lead)
  ndim = getattr(x, 'ndim', 0) - len(lead)
  if SPATIAL_AXIS in mesh.axis_names and ndim >= 3:
    return P(*lead, DATA_AXIS, SPATIAL_AXIS)
  if ndim >= 1:
    return P(*lead, DATA_AXIS)
  return P(*lead)


def shard_batch(batch, mesh):
  """Place a batch pytree with the leading axis sharded over ``data`` (and
  image rows over ``spatial`` on a 2-D mesh). In a multi-process run the
  input leaves are the process-local batch slice; the result is the global
  batch."""
  if mesh is None:
    return batch
  return jax.tree_util.tree_map(
      lambda x: _put(x, mesh, _batch_spec(x, mesh)), batch)


def shard_stacked_batch(batch, mesh):
  """Place a (steps, batch, ...) stacked pytree with axis 1 sharded over
  ``data`` (the scan axis stays unsharded) — the steps_per_fetch
  throughput mode's input layout."""
  if mesh is None:
    return batch
  return jax.tree_util.tree_map(
      lambda x: _put(x, mesh, _batch_spec(x, mesh, lead=(None,))), batch)


def replicate(tree, mesh):
  """Replicate a pytree (params/opt state) across the mesh. Multi-process:
  every process supplies its (identical) local copy — seeds make model
  init deterministic across processes, and checkpoint restores load the
  same host values everywhere."""
  if mesh is None:
    return tree
  return jax.tree_util.tree_map(
      lambda x: _put(x, mesh, P()) if hasattr(x, 'shape') else x, tree)


def gather_to_replicated(tree, mesh):
  """All-gather data-sharded leaves to fully-replicated — required before
  host fetches (metrics, image dumps) in a multi-process run, where a
  data-sharded global array is not addressable from any single process.
  No-op single-process (every sharding is fully addressable there)."""
  if mesh is None or not multiprocess():
    return tree
  sharding = NamedSharding(mesh, P())
  leaves, treedef = jax.tree_util.tree_flatten(tree)
  if not leaves:
    return tree
  gathered = jax.jit(
      lambda *ls: ls,
      out_shardings=tuple(sharding for _ in leaves))(*leaves)
  return jax.tree_util.tree_unflatten(treedef, gathered)

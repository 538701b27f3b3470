"""Multi-device scaling: mesh + sharding configuration.

Replaces the reference's single-node ``nn.DataParallel``
(/root/reference/utils/__init__.py:59-68, utils/custom_data_parallel.py):
instead of replicate/scatter/gather Python machinery, a
``jax.sharding.Mesh`` is declared once, parameters are replicated, batches
are sharded over the ``data`` axis, and GSPMD inserts the gradient
all-reduce over ICI. Models returning dicts need no special handling (the
reason CustomDataParallel existed) — dicts are pytrees.

Config surface::

    "mesh": {"data": -1}     # data-parallel over all visible devices

The reference's multi-GPU trigger (``--cuda '2,3'``) maps to running under
more devices and keeping the default mesh.
"""

from csmri_refinement_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_stacked_batch, replicate, mesh_from_conf)

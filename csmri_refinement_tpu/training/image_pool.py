"""On-device GAN image pool (history buffer).

Rebuild of /root/reference/utils/image_pool.py:29-60 as a pure function over
an explicit pool-state pytree, so the whole adversarial step stays inside
one jitted program (the reference keeps a Python list of tensors and is
updated eagerly per image).

Semantics per batch image (matching ImagePool.query):

* while the pool is not full: insert the image, return it unchanged
* once full: with probability ``p_pool_image`` return a random pool entry
  and replace it with the incoming image; otherwise return the image

Returned images are implicitly detached (callers stop_gradient the pool
input), as in the reference where pool outputs are fresh tensors.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def init_pool(pool_size, image_shape, dtype=jnp.float32):
  """Pool state: {'images': (pool_size, H, W, C), 'count': int32}."""
  if pool_size == 0:
    return None
  return {
      'images': jnp.zeros((pool_size,) + tuple(image_shape), dtype),
      'count': jnp.zeros((), jnp.int32),
  }


def query(pool_state, image_batch, key, p_pool_image=0.5):
  """Mix ``image_batch`` with pool history; returns (new_state, out_batch).

  Processes images sequentially via lax.scan to preserve the reference's
  fill-then-swap order; each step touches a single pool row.
  """
  if pool_state is None:
    return None, image_batch

  pool_size = pool_state['images'].shape[0]
  batch = image_batch.shape[0]
  keys = jax.random.split(key, batch)

  def body(carry, x):
    images, count = carry
    img, k = x
    k_idx, k_p = jax.random.split(k)

    not_full = count < pool_size
    rand_idx = jax.random.randint(k_idx, (), 0, pool_size)
    use_pool = jax.random.uniform(k_p) < p_pool_image

    write_idx = jnp.where(not_full, count, rand_idx)
    row_old = images[write_idx]
    # Write when filling, or when swapping a random entry for the new image
    should_write = jnp.logical_or(not_full, use_pool)
    new_row = jnp.where(should_write, img, row_old)
    images = images.at[write_idx].set(new_row)

    out = jnp.where(not_full, img, jnp.where(use_pool, row_old, img))
    count = count + not_full.astype(jnp.int32)
    return (images, count), out

  (images, count), out_batch = jax.lax.scan(
      body, (pool_state['images'], pool_state['count']),
      (image_batch, keys))
  return {'images': images, 'count': count}, out_batch


def pool_size_from_conf(conf, disc_conf) -> Optional[int]:
  """Pool sizing (reference training/adversarial_training.py:96-99)."""
  if not disc_conf.get_attr('use_image_pool', default=False):
    return None
  return disc_conf.get_attr('image_pool_size',
                            default=5 * conf.batch_size)

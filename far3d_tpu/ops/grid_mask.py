"""GridMask augmentation on device (reference: models/utils/grid_mask.py).

The reference builds the mask on host with numpy/PIL per batch (grid_mask.py:84-123,
config rotate=1 => randint(1)==0, i.e. no rotation ever happens). Here the mask is
generated inside jit from a JAX PRNG key: with mode=1 the *kept* pixels are the union
of horizontal and vertical stripes of width l, period d, random phase. One mask is
shared batch-wide, applied with probability `prob`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(key: jax.Array, images: jax.Array, prob: float = 0.7,
              ratio: float = 0.5) -> jax.Array:
    """images: (..., H, W, C). Returns masked images."""
    h, w = images.shape[-3], images.shape[-2]
    k_apply, k_d, k_sh, k_sw = jax.random.split(key, 4)
    apply = jax.random.uniform(k_apply) < prob
    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    # stripe if ((idx - st) mod d) < l  (mode=1 inverts: stripes are KEPT)
    in_h = ((rows - st_h) % d) < l
    in_w = ((cols - st_w) % d) < l
    keep = in_h[:, None] | in_w[None, :]
    mask = jnp.where(apply, keep.astype(images.dtype),
                     jnp.ones((h, w), images.dtype))
    return images * mask[..., None]

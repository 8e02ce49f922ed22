"""Positional-embedding utilities.

Reference behavior (util/pos_embed.py):
  * 2D sin-cos generator (:20-67)
  * bicubic grid interpolation for checkpoints at a different image/patch
    resolution, image (:106-127) and video-tubelet (:75-104) variants.

TPU-native: interpolation uses ``jax.image.resize`` (cubic) on the [gh, gw, D]
grid; runs once at load time so precision mode is irrelevant to step time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """[T, D] 2D sin-cos positional embedding (reference :20-40)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)          # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d_sincos(embed_dim // 2, grid[0])
    emb_w = _1d_sincos(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim), np.float32), pos], axis=0)
    return pos


def _1d_sincos(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def interpolate_pos_embed_video(pos_embed: np.ndarray, new_num_patches: int,
                                num_frames: int, tubelet_size: int = 2,
                                num_prefix_tokens: int = 0) -> np.ndarray:
    """Video-tubelet pos-embed interpolation (reference util/pos_embed.py:75-104):
    the checkpoint grid is [T//tubelet, gh, gw]; spatial dims resize bicubic,
    the temporal dim is preserved.  new_num_patches is per-frame (gh'*gw')."""
    pos_embed = np.asarray(pos_embed)
    _, t_old, dim = pos_embed.shape
    t_frames = num_frames // tubelet_size
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    spatial_old = grid.shape[1] // t_frames
    gs_old = int(round(spatial_old ** 0.5))
    gs_new = int(round(new_num_patches ** 0.5))
    if gs_old == gs_new:
        return pos_embed
    grid = grid.reshape(t_frames, gs_old, gs_old, dim)
    grid = jax.image.resize(jnp.asarray(grid),
                            (t_frames, gs_new, gs_new, dim), method="cubic")
    grid = np.asarray(grid).reshape(1, t_frames * gs_new * gs_new, dim)
    return np.concatenate([prefix, grid], axis=1) if num_prefix_tokens \
        else grid


def interpolate_pos_embed(pos_embed: np.ndarray, new_num_patches: int,
                          num_prefix_tokens: int = 1) -> np.ndarray:
    """Resize a [1, T_old, D] learnable pos-embed to a new patch grid
    (reference util/pos_embed.py:106-127; bicubic on the square grid,
    prefix/CLS rows passed through)."""
    pos_embed = np.asarray(pos_embed)
    _, t_old, dim = pos_embed.shape
    old_patches = t_old - num_prefix_tokens
    if old_patches == new_num_patches:
        return pos_embed
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    gs_old = int(round(old_patches ** 0.5))
    gs_new = int(round(new_num_patches ** 0.5))
    grid = grid.reshape(1, gs_old, gs_old, dim)
    grid = jax.image.resize(jnp.asarray(grid), (1, gs_new, gs_new, dim),
                            method="cubic")
    grid = np.asarray(grid).reshape(1, gs_new * gs_new, dim)
    return np.concatenate([prefix, grid], axis=1)

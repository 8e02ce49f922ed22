"""Positional-embedding utilities.

Reference behavior (util/pos_embed.py):
  * 2D sin-cos generator (:20-67)
  * bicubic grid interpolation for checkpoints at a different image/patch
    resolution, image (:106-127) and video-tubelet (:75-104) variants.

The grid resize reproduces torch's ``F.interpolate(mode='bicubic',
align_corners=False)`` EXACTLY (cubic-convolution kernel with A=-0.75,
replicate-clamped border taps) — ``jax.image.resize(method='cubic')`` uses
the Keys a=-0.5 kernel and diverges by up to ~0.3 on unit-normal embeddings,
which would change the fine-tune starting point vs the reference load path.
Runs once at load time, in numpy.
"""

from __future__ import annotations

import numpy as np


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


def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix reproducing torch
    ``upsample_bicubic2d`` along one axis: half-pixel source coordinates,
    cubic-convolution weights with A=-0.75, border taps clamped
    (replicate)."""
    A = -0.75

    def w(d):
        d = abs(d)
        if d <= 1.0:
            return (A + 2.0) * d ** 3 - (A + 3.0) * d ** 2 + 1.0
        if d < 2.0:
            return A * d ** 3 - 5.0 * A * d ** 2 + 8.0 * A * d - 4.0 * A
        return 0.0

    scale = n_in / n_out
    m = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        for k in range(-1, 3):
            m[i, min(max(x0 + k, 0), n_in - 1)] += w(t - k)
    return m


def _bicubic_grid_resize(grid: np.ndarray, gs_new: int) -> np.ndarray:
    """[..., gh, gw, D] -> [..., gs_new, gs_new, D], torch-bicubic exact."""
    gh, gw = grid.shape[-3], grid.shape[-2]
    mh = _bicubic_matrix(gh, gs_new)
    mw = _bicubic_matrix(gw, gs_new)
    out = np.einsum("oh,...hwd->...owd", mh, grid.astype(np.float64))
    out = np.einsum("pw,...owd->...opd", mw, out)
    return out.astype(grid.dtype)


def interpolate_pos_embed_video(pos_embed: np.ndarray, new_num_patches: int,
                                num_frames: int, tubelet_size: int = 2,
                                num_prefix_tokens: int = 0) -> np.ndarray:
    """Video-tubelet pos-embed interpolation: the checkpoint grid is
    [T//tubelet, gh, gw]; spatial dims resize bicubic per time group, the
    temporal dim is preserved.  new_num_patches is per-frame (gh'*gw').

    Deviation note: the reference's video variant (util/pos_embed.py:75-104)
    is dead code (main_video.py:272 is commented out) and crashes when
    executed on a real grid mismatch — it takes orig_size from the sqrt of
    the TOTAL time*space token count (:84) but reshapes per time group
    (:94).  Pinned by execution in
    tests/test_reference_data_executed.py::test_video_interpolate_dead_code.
    """
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
    grid = _bicubic_grid_resize(grid, gs_new)
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
    grid = _bicubic_grid_resize(grid, gs_new)
    grid = np.asarray(grid).reshape(1, gs_new * gs_new, dim)
    return np.concatenate([prefix, grid], axis=1)

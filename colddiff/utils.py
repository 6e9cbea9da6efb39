"""Small shared utilities: EMA tree ops, image grid / GIF saving, cycling."""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Iterable, Iterator

import jax
import numpy as np

__all__ = [
    "ema_update",
    "bf16_params",
    "retry_compile",
    "apply_in_chunks",
    "cycle",
    "to_uint8_grid",
    "save_image_grid",
    "add_title_bar",
    "save_gif",
    "create_folder",
    "enable_compilation_cache",
]


def ema_update(ema_params, new_params, decay: float):
    """EMA shadow update: old * decay + new * (1 - decay)
    (reference EMA.update_average, deblurring_diffusion_pytorch.py:66-81)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, new_params
    )


def bf16_params(params):
    """Cast floating leaves to bfloat16 for bf16 compute.

    The caller keeps the fp32 master copy; integer/bool leaves pass through
    untouched.  This is THE bf16 recipe (CLAUDE.md: cast params AND inputs
    at apply time -- casting only the input is a no-op because flax layers
    with dtype=None promote activations back to the param dtype)."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)


def retry_compile(thunk, attempts: int = 3, delay: float = 15.0):
    """Run ``thunk`` with retries: this environment's remote-compile tunnel
    flakes occasionally; a short pause and a second attempt recovers it."""
    import time

    for i in range(attempts):
        try:
            return thunk()
        except Exception:
            if i == attempts - 1:
                raise
            time.sleep(delay)


def apply_in_chunks(fn, chunk_size: int, *args):
    """Apply a batched ``fn(*args)`` in sequential chunks of ``chunk_size``.

    Jit-compatible (static chunking via ``lax.scan`` of ``fn`` over reshaped
    chunks).  XLA schedules the flagship 128px UNet forward poorly above
    B=32 (~1.8x per-image regression at B=64 from activation spills), so big
    eval batches run as several well-scheduled chunks of one program instead
    of one badly-scheduled wide program.  Ragged batches are zero-padded to a
    chunk multiple and the padding rows sliced off the output.
    """
    import jax.numpy as jnp

    b = jax.tree_util.tree_leaves(args)[0].shape[0]
    if b <= chunk_size:
        return fn(*args)
    n = -(-b // chunk_size)
    pad = n * chunk_size - b

    def to_chunks(a):
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        return a.reshape(n, chunk_size, *a.shape[1:])

    stacked = jax.tree_util.tree_map(to_chunks, args)
    out = jax.lax.map(lambda ch: fn(*ch), stacked)
    return jax.tree_util.tree_map(
        lambda o: o.reshape(n * chunk_size, *o.shape[2:])[:b], out
    )


def cycle(iterable: Iterable) -> Iterator:
    while True:
        empty = True
        for item in iterable:
            empty = False
            yield item
        if empty:
            # a drop_last loader over a too-small dataset yields no batches;
            # spinning here would hang the caller silently
            raise ValueError(
                "cycle(): underlying iterable produced no items "
                "(dataset smaller than the loader batch size?)")


def to_uint8_grid(images: np.ndarray, nrow: int = 6) -> np.ndarray:
    """[B, H, W, C] in [-1, 1] -> one [gH, gW, 3] uint8 grid (2px padding),
    matching torchvision save_image((x+1)*0.5, nrow=6) usage in the Trainers."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    if c == 1:
        images = np.repeat(images, 3, axis=-1)
        c = 3
    ncol = min(nrow, b)
    nrw = math.ceil(b / ncol)
    pad = 2
    grid = np.ones((nrw * (h + pad) + pad, ncol * (w + pad) + pad, 3), dtype=np.float32)
    for i in range(b):
        r, cl = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + cl * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = (images[i] + 1.0) * 0.5
    return (np.clip(grid, 0.0, 1.0) * 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str | os.PathLike, nrow: int = 6) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8_grid(images, nrow)).save(path)


def add_title_bar(frame: np.ndarray, titles: list[str]) -> np.ndarray:
    """10px black border + 20px magenta title strip with evenly spaced texts
    (reference Trainer.add_title, snowification/diffusion/diffusion.py:682-706)."""
    from PIL import Image, ImageDraw

    frame = np.pad(frame, ((10, 10), (10, 10), (0, 0)))
    bar = np.zeros((20, frame.shape[1], 3), np.uint8)
    bar[:] = (180, 0, 255)  # the reference's BGR (255, 0, 180), as RGB
    img = Image.fromarray(np.concatenate([bar, frame], axis=0))
    draw = ImageDraw.Draw(img)
    n = max(len(titles), 1)
    for i, title in enumerate(titles):
        x = i * (frame.shape[1] // n) + frame.shape[1] // (2 * n)
        draw.text((x, 4), str(title), fill=(0, 0, 0))
    return np.asarray(img)


def save_gif(frames: list[np.ndarray], path: str | os.PathLike, fps: int = 5,
             titles: bool = False) -> None:
    """Save a list of [B, H, W, C] batches in [-1, 1] as an animated grid GIF
    (reference save_gif, snowification/diffusion/diffusion.py:764-807).
    ``titles=True`` adds the reference's per-frame step-index title bar."""
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    grids = [to_uint8_grid(f) for f in frames]
    if titles:
        grids = [add_title_bar(g, [str(i)]) for i, g in enumerate(grids)]
    pil = [Image.fromarray(g) for g in grids]
    pil[0].save(
        path, save_all=True, append_images=pil[1:], duration=int(1000 / fps), loop=0
    )


def create_folder(path: str | os.PathLike) -> None:
    Path(path).mkdir(parents=True, exist_ok=True)


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None,
                             tpu_only: bool = True) -> str | None:
    """Point JAX's persistent compilation cache at a colddiff-owned directory.

    The flagship T=200 fused-scan samplers compile for minutes on TPU (this
    container tunnels compiles to a remote service); the persistent cache
    makes every later process reusing the same program start in seconds
    (verified working through the axon tunnel: second-process compile 2x+
    faster, cache entries written).  Called from the CLI entry point and
    bench.py -- never on library import, so embedding programs keep full
    control.

    Resolution order: explicit ``cache_dir`` arg > JAX_COMPILATION_CACHE_DIR
    env (left untouched) > an already-configured jax setting (left
    untouched) > ``$COLDDIFF_CACHE_DIR`` > ``~/.cache/colddiff/xla``.
    Set ``COLDDIFF_NO_COMPILATION_CACHE=1`` to disable.  Returns the active
    cache dir, or None when disabled/externally managed.

    ``tpu_only`` (default): no-op on non-TPU backends -- XLA:CPU cache
    entries are AOT-compiled for the exact host machine features and reload
    with SIGILL-risk warnings on any other host, while CPU compiles are fast
    anyway; the payoff is the TPU path.
    """
    import jax

    if os.environ.get("COLDDIFF_NO_COMPILATION_CACHE"):
        return None
    if tpu_only and jax.default_backend() != "tpu":
        return None
    if cache_dir is None:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return os.environ["JAX_COMPILATION_CACHE_DIR"]
        if jax.config.jax_compilation_cache_dir:
            return jax.config.jax_compilation_cache_dir
        cache_dir = os.environ.get("COLDDIFF_CACHE_DIR") or (
            Path.home() / ".cache" / "colddiff" / "xla"
        )
    cache_dir = str(cache_dir)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir

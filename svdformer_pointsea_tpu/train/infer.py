"""Standalone completion inference: point-cloud file(s) -> completed clouds.

Beyond-reference serving surface: the reference can only complete samples
routed through its dataset classes (core/test_pcn.py drives
utils/data_loaders.py end-to-end; main_pcn.py's ``--inference`` flag still
runs that same dataset-backed loop) — completing one's own scan means
writing a new dataset class. Here ``main_pcn.py --complete PATH --weights
CKPT`` accepts a single .pcd/.npy/.h5/.txt file or a directory of them and
writes ``<stem>_completion.pcd`` next to each input (or under ``--out``).

TPU-shaped by construction:

- ONE fixed-shape XLA program: every batch is padded (cyclic repeat) to a
  fixed batch size, so the depth render + forward compile once and every
  dispatch reuses the executable — no per-file recompiles.
- Inputs are resampled to the model's partial size in the spirit of the
  reference's UpSamplePoints (utils/data_transforms.py:153-172 — the
  transform the PCN pipeline actually applies: keep every real point, top
  up by duplication when short; permute-truncate when long) — arbitrary-
  size scans become the static shape the MXU path expects.
- Scans are optionally normalized into the PCN frame the published models
  were trained in (centroid at origin, max radius 0.5) and the completion
  is mapped BACK to the scan's original frame, so outputs overlay the
  input in the user's coordinate system.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from svdformer_pointsea_tpu.configs import Config
from svdformer_pointsea_tpu.data.io import IO
from svdformer_pointsea_tpu.render import make_renderer

SUPPORTED_EXTS = (".pcd", ".npy", ".h5", ".txt")


def _load_xyz(path: str) -> np.ndarray:
    """Load a scan and return its xyz columns, validating the layout.

    Real-scan exports are frequently (N, C>3) — xyz+rgb/normals (N,6) or
    xyz+intensity (N,4). A blind ``reshape(-1, 3)`` would silently
    reinterpret those as interleaved garbage points, so: require a 2-D
    array with >=3 columns, keep the first three, and fail loudly on
    anything else.
    """
    pts = np.asarray(IO.get(path), dtype=np.float32)
    if pts.ndim == 1 and pts.size % 3 == 0:
        # Flat xyz stream (e.g. a .npy saved from a flattened buffer) is
        # unambiguous — columns can't be misaligned when there are only 3.
        pts = pts.reshape(-1, 3)
    if pts.ndim != 2 or pts.shape[1] < 3:
        raise ValueError(
            f"{path}: expected an (N, >=3) point array (xyz in the first "
            f"three columns), got shape {pts.shape}"
        )
    if pts.shape[0] == 0:
        raise ValueError(f"{path}: empty point cloud")
    return np.ascontiguousarray(pts[:, :3])


def _collect_inputs(path: str) -> List[str]:
    """A single supported file, or every supported file under a directory."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(SUPPORTED_EXTS)
            and not f.lower().endswith("_completion.pcd")
        )
        if not files:
            raise FileNotFoundError(
                f"no {'/'.join(SUPPORTED_EXTS)} files under {path}"
            )
        return files
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if not path.lower().endswith(SUPPORTED_EXTS):
        raise ValueError(
            f"unsupported input {path!r} (expected one of {SUPPORTED_EXTS})"
        )
    return [path]


def _resample(pts: np.ndarray, n: int, rng: np.random.RandomState) -> np.ndarray:
    """UpSamplePoints-style resampling (utils/data_transforms.py:153-172,
    the transform the reference PCN pipeline uses): sample without
    replacement when the scan has enough points; keep ALL rows and top up
    with replacement otherwise (never pads with zeros the way
    RandomSamplePoints at :175-186 does)."""
    m = pts.shape[0]
    if m >= n:
        idx = rng.choice(m, n, replace=False)
    else:
        idx = np.concatenate([np.arange(m), rng.choice(m, n - m, replace=True)])
    return pts[idx]


def _to_pcn_frame(pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    """Centroid to origin, max radius to 0.5 (the PCN training frame)."""
    centroid = pts.mean(axis=0)
    centered = pts - centroid
    radius = float(np.linalg.norm(centered, axis=1).max())
    scale = (0.5 / radius) if radius > 0 else 1.0
    return centered * scale, centroid, scale


def infer_files(
    cfg: Config,
    path: str,
    out_dir: Optional[str] = None,
    batch_size: Optional[int] = None,
    normalize: bool = True,
    seed: int = 1,
) -> List[str]:
    """Complete every point-cloud file at ``path``; return output paths.

    ``cfg.weights`` supplies the checkpoint (native or reference ``.pth``
    via the converter — same loading logic as evaluation). ``normalize``
    maps each scan into the PCN frame for the model and maps the completion
    back afterwards.
    """
    from svdformer_pointsea_tpu.nn import set_mixed_precision
    from svdformer_pointsea_tpu.train.loop import (
        build_model,
        init_state,
        load_weights_into_state,
    )
    from svdformer_pointsea_tpu.train.state import make_optimizer

    # Honor --precision like test_net does (must precede the first trace);
    # otherwise the flag would be silently ignored on this surface.
    set_mixed_precision(getattr(cfg.train, "precision", "f32") == "bf16")
    files = _collect_inputs(path)
    model = build_model(cfg)
    state = init_state(
        cfg, model, make_optimizer(weight_decay=cfg.train.weight_decay),
        seed=cfg.seed,
    )
    if cfg.weights:
        state = load_weights_into_state(state, cfg)
    else:
        logging.warning(
            "infer_files: no --weights given — completing with RANDOM-INIT "
            "parameters (smoke/debug only; outputs are not meaningful)."
        )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    render = make_renderer(cfg)

    def body(variables, partial):
        depth = render.render(partial)
        preds = model.apply(variables, partial, depth, train=False)
        return preds[-1]

    fwd = jax.jit(body)

    B = int(batch_size or min(len(files), cfg.train.batch_size))
    n_in = int(cfg.data.n_points)
    rng = np.random.RandomState(seed)
    outputs: List[str] = []
    for lo in range(0, len(files), B):
        chunk = files[lo : lo + B]
        frames: List[Tuple[np.ndarray, float]] = []
        rows = []
        for f in chunk:
            pts = _load_xyz(f)
            if normalize:
                pts, centroid, scale = _to_pcn_frame(pts)
            else:
                centroid, scale = np.zeros(3, np.float32), 1.0
            frames.append((centroid, scale))
            rows.append(_resample(pts, n_in, rng))
        # Fixed batch shape: cyclic-repeat pad so every dispatch reuses the
        # one compiled executable; pad rows are dropped before writing.
        idx = np.arange(B) % len(rows)
        batch = np.stack([rows[i] for i in idx])
        completions = np.asarray(fwd(variables, batch))[: len(chunk)]
        for f, (centroid, scale), comp in zip(chunk, frames, completions):
            comp = comp / scale + centroid  # back to the scan's frame
            stem = os.path.splitext(os.path.basename(f))[0]
            dest_dir = out_dir or os.path.dirname(f) or "."
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, f"{stem}_completion.pcd")
            IO.put(dest, comp.astype(np.float32))
            outputs.append(dest)
            logging.info("completed %s -> %s", f, dest)
    return outputs

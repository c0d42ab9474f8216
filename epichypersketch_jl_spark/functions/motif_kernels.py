"""Pure-numpy kernels for the motif pipeline: build (CMS update) and
extract (CMS query + qualifying-occurrence emission).

These are the Spark-first re-expression of the reference's CUDA kernels:
  * build    ≙ count_kernel_ordinary / count_kernel_conv + sketch update
               (src/count_gpu.jl:84-136)
  * extract  ≙ make_selection! + obtain_motifs_* fused into one pass
               (src/count_gpu.jl:161-286) — we never materialize the
               (num_combs × batch) Bool selection mask; qualifying rows are
               emitted directly from the estimate comparison.

Convolution semantics follow the reference CPU path (src/count_cpu.jl:47-53):
gap = pos_{j+1} - pos_j - filter_len, placements with gap < 0 (overlap)
rejected; start = pos_1, end = pos_k + filter_len - 1
(src/count_gpu.jl:252-257).  See SURVEY.md §2 #10 for the GPU/CPU divergence
and why the CPU semantics were adopted.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..config import HyperSketchConfig
from ..sketches.cms import CountMinSketch
from .combinations import comb_index_matrix, gather_rows, iter_length_groups


def list_column_to_numpy(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, absolute_offsets[n+1]) for a non-null Arrow list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy().astype(np.int64)
    flat = col.values.to_numpy(zero_copy_only=False)
    return flat, offsets


def make_cms(cfg: HyperSketchConfig, conv: bool) -> CountMinSketch:
    """Zero CMS with the key width the mode demands (reference
    src/sketch.jl:84-88: h = k ordinary, 2k-1 convolution)."""
    return CountMinSketch(
        delta=cfg.delta,
        epsilon=cfg.epsilon,
        key_width=cfg.conv_key_width() if conv else cfg.motif_size,
        seed=cfg.seed,
        conservative=cfg.conservative,
    )


def _conv_keys(
    tok_sel: np.ndarray, pos_sel: np.ndarray, filter_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved (filter, gap, filter, gap, ...) keys + validity mask.

    tok_sel/pos_sel: (n, C, k).  Returns keys (n, C, 2k-1), valid (n, C).
    """
    gaps = pos_sel[..., 1:] - pos_sel[..., :-1] - filter_len
    valid = (gaps >= 0).all(axis=-1) if gaps.shape[-1] else np.ones(tok_sel.shape[:2], bool)
    k = tok_sel.shape[-1]
    keys = np.empty(tok_sel.shape[:2] + (2 * k - 1,), dtype=np.int64)
    keys[..., 0::2] = tok_sel
    keys[..., 1::2] = gaps
    return keys, valid


@dataclass
class BuildStats:
    n_rows: int = 0
    n_tokens: int = 0
    n_updates: int = 0


def build_batch(
    cms: CountMinSketch,
    tokens_flat: np.ndarray,
    offsets: np.ndarray,
    cfg: HyperSketchConfig,
    positions_flat: np.ndarray | None = None,
    stats: BuildStats | None = None,
) -> None:
    """Stream every per-row k-combination of one batch into the CMS."""
    k = cfg.motif_size
    lengths = np.diff(offsets)
    conv = positions_flat is not None
    for rows, L in iter_length_groups(lengths, k, cfg.max_cells):
        combs = comb_index_matrix(L, k)
        tm = gather_rows(tokens_flat, offsets, rows, L)
        if conv:
            pm = gather_rows(positions_flat, offsets, rows, L)
            order = np.argsort(pm, axis=1, kind="stable")
            tm = np.take_along_axis(tm, order, axis=1)
            pm = np.take_along_axis(pm, order, axis=1)
            keys, valid = _conv_keys(tm[:, combs], pm[:, combs], cfg.filter_len)
            cms.update_batch(keys[valid])
        else:
            tm = np.sort(tm, axis=1)  # canonical ascending motifs (src/record.jl:237-242)
            keys = tm[:, combs]
            cms.update_batch(keys.reshape(-1, k))
    if stats is not None:
        stats.n_rows += len(lengths)
        stats.n_tokens += int(lengths.sum())


@dataclass
class ExtractOut:
    """Columnar accumulator for qualifying occurrences of one batch."""

    motifs: list = field(default_factory=list)  # (m, k) int
    gaps: list = field(default_factory=list)  # (m, k-1) int   (conv only)
    starts: list = field(default_factory=list)  # (m,) int       (conv only)
    ends: list = field(default_factory=list)  # (m,) int       (conv only)
    row_idx: list = field(default_factory=list)  # (m,) local batch row index
    contribs: list = field(default_factory=list)  # (m,) float
    counts: list = field(default_factory=list)  # (m,) int64


def extract_batch(
    cms: CountMinSketch,
    tokens_flat: np.ndarray,
    offsets: np.ndarray,
    cfg: HyperSketchConfig,
    positions_flat: np.ndarray | None = None,
    weights_flat: np.ndarray | None = None,
) -> ExtractOut:
    """Re-enumerate combinations, query the merged CMS, emit rows with
    estimate >= min_count (fuses reference phases select + extract)."""
    k = cfg.motif_size
    lengths = np.diff(offsets)
    conv = positions_flat is not None
    out = ExtractOut()
    for rows, L in iter_length_groups(lengths, k, cfg.max_cells):
        combs = comb_index_matrix(L, k)
        tm = gather_rows(tokens_flat, offsets, rows, L)
        wm = gather_rows(weights_flat, offsets, rows, L) if weights_flat is not None else None
        if conv:
            pm = gather_rows(positions_flat, offsets, rows, L)
            order = np.argsort(pm, axis=1, kind="stable")
            tm = np.take_along_axis(tm, order, axis=1)
            pm = np.take_along_axis(pm, order, axis=1)
            if wm is not None:
                wm = np.take_along_axis(wm, order, axis=1)
            tok_sel = tm[:, combs]
            pos_sel = pm[:, combs]
            keys, valid = _conv_keys(tok_sel, pos_sel, cfg.filter_len)
            est = cms.estimate(keys.reshape(-1, keys.shape[-1])).reshape(keys.shape[:2])
            sel = valid & (est >= cfg.min_count)
            ri, ci = np.nonzero(sel)
            if ri.size == 0:
                continue
            out.motifs.append(tok_sel[ri, ci])
            out.gaps.append(keys[ri, ci, 1::2])
            out.starts.append(pos_sel[ri, ci, 0])
            out.ends.append(pos_sel[ri, ci, -1] + cfg.filter_len - 1)
        else:
            order = np.argsort(tm, axis=1, kind="stable")
            tm = np.take_along_axis(tm, order, axis=1)
            if wm is not None:
                wm = np.take_along_axis(wm, order, axis=1)
            keys = tm[:, combs]
            est = cms.estimate(keys.reshape(-1, k)).reshape(keys.shape[:2])
            sel = est >= cfg.min_count
            ri, ci = np.nonzero(sel)
            if ri.size == 0:
                continue
            out.motifs.append(keys[ri, ci])
        # shared tail: contribution, doc row, count
        if wm is not None:
            contrib = wm[:, combs].sum(axis=-1)[ri, ci]
        else:
            contrib = np.full(ri.size, float(k))
        out.contribs.append(contrib)
        out.row_idx.append(rows[ri])
        out.counts.append(est[ri, ci])
    return out

"""Structure-aware sparse storage for CA constraint matrices.

The generic MXU one-hot matvec (ops/mxu_sparse) costs ~``nnz * m`` MACs
per pass because every nonzero's one-hot spans the whole m-row space.
At the reference's very-large CA rungs
(cython_solver/LPboxADMMsolver.cpp:2461-2486) m is dominated by DUMMY
items -- the XOR rows the Leyton-Brown sampler adds per substitutable
bidder (generate_instances.py:294-303) -- e.g. (1000 items, 1e5 bids)
has m ~ 19.8k of which ~18.8k are dummy rows.  Those rows are highly
structured:

* each bid (column) carries at most ONE dummy nonzero;
* each dummy row covers that bidder's bids, which the sampler appends
  CONSECUTIVELY -- so dummy rows are disjoint, ascending column
  intervals.

``CaStructE`` therefore splits E row-wise into

* an **item block** (m1 ~ n_items rows): a width-capped ``SparseEll``
  whose one-hots span only m1 (~20x cheaper per nonzero than m), plus
  a compacted overflow ``SparseEll`` for the few columns above the
  width cap (rejoined through a 1-nnz-per-column selector, also an MXU
  one-hot op -- n_ov * n MACs, negligible);
* a **dummy block** stored as one sorted row index per column.  Its
  matvecs run over column chunks whose touched rows provably fit a
  small static window (a chunk of Td consecutive columns touches at
  most ~Td/3 dummy rows, since a dummy row needs >= 3 bids): the
  one-hots span the window (Rmax rows), the window base per chunk is
  precomputed on host, and window slices/accumulations are batched
  dynamic slices inside one ``lax.scan``.

The m-axis layout is ``[item rows (padded to m1p) | dummy rows (padded
to m2p)]`` per instance; ``make_struct_problem`` (adapters/ca.py)
builds f/row_mask/host-Gram in the same layout.  Payload precision
follows ops/mxu_sparse: bf16 one-hots, 3-limb bf16 operands, f32
accumulation (f32-equivalent).

The split is detected STRUCTURALLY (the maximal suffix of rows that
are disjoint ascending column intervals), not by provenance -- any
matrix tail with that shape benefits; matrices without it simply get
``m1 = m`` (pure generic block).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import mxu_sparse
from . import sparse as sparse_ops


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, k: int) -> int:
    return _cdiv(x, k) * k


class CaStructE(NamedTuple):
    """Batched structured sparse (B, m1p + m2p, n) matrix.

    All leaves carry a leading batch axis (so ``solve_blocked``'s
    tree-map slicing works); static sizes are derived from shapes.
    """

    item: sparse_ops.SparseEll     # (B, m1p, n) width-capped item block
    over: sparse_ops.SparseEll     # (B, m1p, n_ov) overflow columns
    sel: sparse_ops.SparseEll      # (B, n, n_ov) overflow column selector
    drow_loc: jnp.ndarray          # (B, NCd, Td) int32 window-local dummy row
    dval: jnp.ndarray              # (B, NCd, Td) f32 1/0 column has dummy
    dbase: jnp.ndarray             # (B, NCd) int32 window base row
    rwin: jnp.ndarray              # (B, Rmax) zeros -- encodes Rmax; its
                                   # DTYPE selects the payload mode:
                                   # bf16 = fast (3-limb bf16 payloads),
                                   # f32 = exact (f32/HIGHEST, v1)
    m2_rows: jnp.ndarray           # (B, m2p) f32 1/0 real dummy row mask
    csq: jnp.ndarray               # (B, n) per-column squared norms

    is_sparse_matrix = True        # ops/sparse.py dispatch marker

    @property
    def batch(self) -> int:
        return self.item.row_idx.shape[0]

    @property
    def m1(self) -> int:
        return self.item.m

    @property
    def m2(self) -> int:
        return self.m2_rows.shape[1]

    @property
    def m(self) -> int:
        return self.m1 + self.m2

    @property
    def n(self) -> int:
        return self.item.n

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.batch, self.m, self.n)

    # ---- matvecs ----------------------------------------------------

    def mv_many(self, Vk: jnp.ndarray) -> jnp.ndarray:
        return _mv_many(self, Vk)

    def mtv_many(self, Wk: jnp.ndarray) -> jnp.ndarray:
        return _mtv_many(self, Wk)

    def mv(self, v: jnp.ndarray) -> jnp.ndarray:
        return _mv_many(self, v[:, None])[:, 0]

    def mtv(self, w: jnp.ndarray) -> jnp.ndarray:
        return _mtv_many(self, w[:, None])[:, 0]

    def colsq(self) -> jnp.ndarray:
        return self.csq


@jax.jit
def _mv_many(S: CaStructE, Vk: jnp.ndarray) -> jnp.ndarray:
    """E @ v stack: (B, k, n) -> (B, k, m1p + m2p)."""
    B, k, n = Vk.shape
    exact = S.rwin.dtype == jnp.float32
    nl = 1 if exact else 3
    oh_dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None
    # item block: main + overflow (compressed through the selector)
    out_i = mxu_sparse.mv_many(S.item, Vk, lo_width=16, exact=exact)
    if S.over.n > 0:
        V_ov = mxu_sparse.mtv_many(S.sel, Vk, exact=exact)  # (B, k, n_ov)
        out_i = out_i + mxu_sparse.mv_many(S.over, V_ov, lo_width=16,
                                           exact=exact)

    # dummy block: per column-chunk local-window one-hot scatter
    NCd, Td = S.drow_loc.shape[1:]
    Rmax = S.rwin.shape[1]
    m2p = S.m2
    W = 16
    H = Rmax // W
    # payload per column chunk: (B, NCd, Td, k) f32 -> limbs
    v_cols = Vk.astype(jnp.float32)
    pad = NCd * Td - n
    if pad:
        v_cols = jnp.pad(v_cols, ((0, 0), (0, 0), (0, pad)))
    v_cols = v_cols.reshape(B, k, NCd, Td).transpose(2, 0, 3, 1)
    wk = S.dval.transpose(1, 0, 2)[:, :, :, None] * v_cols
    wl = (wk[..., None] if exact else mxu_sparse._limbs3(wk)
          ).reshape(NCd, B, Td, k * nl)                # (NCd,B,Td,knl)
    idx_c = S.drow_loc.transpose(1, 0, 2)              # (NCd, B, Td)
    base_c = S.dbase.transpose(1, 0)                   # (NCd, B)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W), 3)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)

    def step(acc, args):
        idx, w, base = args
        hi = idx // W
        lo = idx % W
        oh_hi = (hi[:, :, None] == hi_iota).astype(oh_dt)
        Z = jnp.where(lo[:, :, None, None] == lanes,
                      w[:, :, :, None], 0.0)
        Z = Z.astype(oh_dt).reshape(B, Td, k * nl * W)
        contrib = jax.lax.dot_general(
            oh_hi, Z, (((1,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)        # (B,H,k*nl*W)
        contrib = contrib.reshape(B, H, k, nl, W).sum(3)
        contrib = contrib.transpose(0, 2, 1, 3).reshape(B, k, Rmax)

        def upd(a, c, s):
            win = jax.lax.dynamic_slice(a, (0, s), (k, Rmax))
            return jax.lax.dynamic_update_slice(a, win + c, (0, s))

        return jax.vmap(upd)(acc, contrib, base), None

    acc0 = jnp.zeros((B, k, m2p + Rmax), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (idx_c, wl, base_c))
    out_d = acc[:, :, :m2p]
    return jnp.concatenate([out_i, out_d], axis=-1)


@jax.jit
def _mtv_many(S: CaStructE, Wk: jnp.ndarray) -> jnp.ndarray:
    """E^T @ w stack: (B, k, m1p + m2p) -> (B, k, n)."""
    B, k, m = Wk.shape
    exact = S.rwin.dtype == jnp.float32
    nl = 1 if exact else 3
    oh_dt = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else None
    m1p = S.m1
    Wi = Wk[:, :, :m1p]
    Wd = Wk[:, :, m1p:]
    out = mxu_sparse.mtv_many(S.item, Wi, exact=exact)
    if S.over.n > 0:
        ov = mxu_sparse.mtv_many(S.over, Wi, exact=exact)   # (B, k, n_ov)
        out = out + mxu_sparse.mv_many(S.sel, ov, exact=exact)

    # dummy block: local-window one-hot gather of w_d[drow]
    NCd, Td = S.drow_loc.shape[1:]
    Rmax = S.rwin.shape[1]
    R1 = Rmax // 128
    n = S.n
    Wd_pad = jnp.pad(Wd.astype(jnp.float32), ((0, 0), (0, 0), (0, Rmax)))
    idx_c = S.drow_loc.transpose(1, 0, 2)              # (NCd, B, Td)
    val_c = S.dval.transpose(1, 0, 2)                  # (NCd, B, Td)
    base_c = S.dbase.transpose(1, 0)                   # (NCd, B)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 128), 4)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R1), 2)

    def step(_, args):
        idx, val, base = args
        win = jax.vmap(lambda wb, s: jax.lax.dynamic_slice(
            wb, (0, s), (k, Rmax)))(Wd_pad, base)      # (B, k, Rmax)
        wr = win.reshape(B, k, R1, 128)
        U = wr[..., None] if exact else mxu_sparse._limbs3(wr)
        U = U.transpose(0, 2, 1, 4, 3).reshape(B, R1, k * nl * 128)
        hi = idx // 128
        lo = idx % 128
        oh = (hi[:, :, None] == hi_iota).astype(oh_dt)
        R = jax.lax.dot_general(
            oh, U, (((2,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)        # (B,Td,k*nl*128)
        R = R.reshape(B, Td, k, nl, 128)
        g = jnp.sum(jnp.where(lo[:, :, None, None, None] == lanes,
                              R, 0.0), axis=(3, 4))    # (B, Td, k)
        return None, val[:, :, None] * g

    _, parts = jax.lax.scan(step, None, (idx_c, val_c, base_c))
    flat = parts.transpose(1, 0, 2, 3).reshape(B, NCd * Td, k)[:, :n]
    return out + flat.transpose(0, 2, 1)


# --------------------------------------------------------------------------
# Host-side construction
# --------------------------------------------------------------------------

def detect_interval_suffix(rows: np.ndarray, cols: np.ndarray,
                           m: int) -> int:
    """Return the smallest boundary ``mb`` such that every row in
    [mb, m) is a consecutive-column interval, the intervals are
    disjoint and ascending with the row index, and no column carries
    two suffix rows.  Rows below mb form the generic item block."""
    order = np.lexsort((cols, rows))
    r_s, c_s = rows[order], cols[order]
    starts = np.full(m, -1, np.int64)
    ends = np.full(m, -2, np.int64)
    counts = np.bincount(rows, minlength=m)
    first = np.searchsorted(r_s, np.arange(m), side="left")
    last = np.searchsorted(r_s, np.arange(m), side="right") - 1
    has = counts > 0
    starts[has] = c_s[first[has]]
    ends[has] = c_s[last[has]]
    consec = has & (ends - starts + 1 == counts)
    mb = m
    prev_start = np.iinfo(np.int64).max
    for r in range(m - 1, -1, -1):
        if not consec[r] or ends[r] >= prev_start:
            break
        prev_start = starts[r]
        mb = r
    return mb


class _StructParts(NamedTuple):
    item_coo: Tuple[np.ndarray, np.ndarray, np.ndarray]
    over_coo: Tuple[np.ndarray, np.ndarray, np.ndarray]
    sel_cols: np.ndarray           # original column of each overflow col
    drow: np.ndarray               # (n,) dummy row of column or -1
    mb: int                        # item-row count
    m2: int                        # dummy-row count


def _split_instance(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                    m: int, n: int, width_cap: int) -> _StructParts:
    mb = detect_interval_suffix(rows, cols, m)
    dummy = rows >= mb
    drow = np.full(n, -1, np.int64)
    drow[cols[dummy]] = rows[dummy] - mb

    ir, ic, iv = rows[~dummy], cols[~dummy], vals[~dummy]
    # width cap: per column keep the first ``width_cap`` item nonzeros
    # in the main block, the rest in the compacted overflow block
    order = np.lexsort((ir, ic))
    ir, ic, iv = ir[order], ic[order], iv[order]
    ccounts = np.bincount(ic, minlength=n)
    cstarts = np.concatenate([[0], np.cumsum(ccounts)[:-1]])
    pos = np.arange(len(ic)) - cstarts[ic]
    main = pos < width_cap
    over_cols = np.unique(ic[~main])
    remap = np.full(n, -1, np.int64)
    remap[over_cols] = np.arange(len(over_cols))
    return _StructParts(
        item_coo=(ir[main], ic[main], iv[main]),
        over_coo=(ir[~main], remap[ic[~main]], iv[~main]),
        sel_cols=over_cols,
        drow=drow, mb=mb, m2=m - mb)


def build(coos: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
          shapes: Sequence[Tuple[int, int]], n: int,
          width_cap: int = 12, td: int = 2048, align: int = 128,
          exact: bool = False) -> Tuple[CaStructE, list]:
    """Build a batched CaStructE from per-instance COO triplets with
    per-instance ``shapes`` (m_i, n_i), padded to a shared column
    count ``n``.  Returns ``(S, row_maps)`` where ``row_maps[i]``
    (m_i,) gives each original row's position on the struct m-axis
    (items then dummies, each block padded) -- callers building
    host-side Gram/f/row_mask must use the same layout."""
    B = len(coos)
    parts = [_split_instance(np.asarray(r, np.int64),
                             np.asarray(c, np.int64),
                             np.asarray(v, np.float32),
                             mi, n, width_cap)
             for (r, c, v), (mi, _) in zip(coos, shapes)]
    m1p = _round_up(max(max(p.mb for p in parts), 1), align)
    m2p = _round_up(max(max(p.m2 for p in parts), 1), align)
    n_ov = _round_up(max(max(len(p.sel_cols) for p in parts), 1), align)
    NCd = _cdiv(n, td)
    n_pad = NCd * td

    # dummy windows: per chunk of td columns, base = min local drow,
    # Rmax = global max window extent (rounded up to 128)
    drow_loc = np.zeros((B, NCd, td), np.int32)
    dval = np.zeros((B, NCd, td), np.float32)
    dbase = np.zeros((B, NCd), np.int32)
    rmax = 128
    for b, p in enumerate(parts):
        dr = np.full(n_pad, -1, np.int64)
        dr[:n] = p.drow
        dr = dr.reshape(NCd, td)
        has = dr >= 0
        for i in range(NCd):
            if has[i].any():
                base = int(dr[i][has[i]].min())
                ext = int(dr[i][has[i]].max()) - base + 1
                rmax = max(rmax, _round_up(ext, 128))
                dbase[b, i] = base
                drow_loc[b, i][has[i]] = dr[i][has[i]] - base
        dval[b][has] = 1.0

    item = sparse_ops.from_coo([p.item_coo for p in parts], (m1p, n))
    over = sparse_ops.from_coo([p.over_coo for p in parts], (m1p, n_ov))
    sel = sparse_ops.from_coo(
        [(p.sel_cols, np.arange(len(p.sel_cols)),
          np.ones(len(p.sel_cols), np.float32)) for p in parts],
        (n, n_ov))
    m2_rows = np.zeros((B, m2p), np.float32)
    csq = np.zeros((B, n), np.float32)
    row_maps = []
    for b, (p, (r, c, v)) in enumerate(zip(parts, coos)):
        m2_rows[b, : p.m2] = 1.0
        csq[b] = np.bincount(np.asarray(c, np.int64),
                             weights=np.asarray(v, np.float64) ** 2,
                             minlength=n)[:n]
        row_maps.append(np.concatenate([
            np.arange(p.mb),
            m1p + np.arange(p.m2)]))
    S = CaStructE(
        item=item, over=over, sel=sel,
        drow_loc=jnp.asarray(drow_loc), dval=jnp.asarray(dval),
        dbase=jnp.asarray(dbase),
        rwin=jnp.zeros((B, rmax),
                       jnp.float32 if exact else jnp.bfloat16),
        m2_rows=jnp.asarray(m2_rows), csq=jnp.asarray(csq))
    return S, row_maps


def to_dense(S: CaStructE) -> jnp.ndarray:
    """Materialize (B, m, n) -- tests only."""
    B, m, n = S.shape
    eye_n = jnp.eye(n, dtype=jnp.float32)
    cols = jnp.broadcast_to(eye_n[None], (B, n, n)).transpose(0, 2, 1)
    out = _mv_many(S, cols)                            # (B, n, m)
    return out.transpose(0, 2, 1)

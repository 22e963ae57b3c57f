"""Weighted edit operations — the reference's generalized OperationSet.

The reference models edit distance as a set of operations
⟨consume_x, consume_y, weight⟩ with optional character-pair restriction
sets (/root/reference/src/transducer/operation_type.rs:134-281,
operation_set.rs:78-240; "TCS 2011" generalized Levenshtein). This module
carries the weighted model into the engine:

- ``WeightedOps`` — per-op float costs for insert ⟨0,1⟩, delete ⟨1,0⟩,
  substitute ⟨1,1⟩, transpose ⟨2,2⟩, plus restricted substitution
  classes (pairs, weight) — e.g. OCR o↔0 at 0.2 (operation_type.rs
  examples). Zero-weight ops must preserve length (the reference's
  Theorem 8.2 assertion): insert/delete weights must be > 0.
- ``weighted_distance_py`` — O(mn) float DP oracle; also supports the
  reference's multi-char restricted ops (e.g. ph→f ⟨2,1,0.15⟩) via
  ``string_ops``.
- ``weighted_batch_distance`` — numpy banded float DP vectorized across
  an Arrow batch (char-level ops), band half-width derived from
  max_cost / min(insert, delete); the weighted twin of
  distance.batch_distance.
- ``make_weighted_distance_udf`` — pandas UDF returning DOUBLE cost,
  sentinel max_cost + 1.0 above threshold.

Asymmetry note: with insert != delete the metric is DIRECTIONAL
(d(a→b) != d(b→a)); unlike the unit-cost kernel no operand swap is ever
performed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import pandas as pd

_SENTINEL_PAD = 1.0


@dataclass(frozen=True)
class WeightedOps:
    """Operation weights. ``None`` disables an optional op. ``restricted``
    is a tuple of (frozenset of char pairs, weight) substitution classes;
    the effective substitution cost of (x, y) is the minimum over the
    default and every class containing the pair (symmetric).

    ``string_ops`` is a tuple of multi-char restricted operations
    (x_str, y_str, weight) ⟨consume_x, consume_y, weight⟩ — e.g.
    ("ph", "f", 0.15), the reference's phonetic digraph example
    (/root/reference/src/transducer/operation_set.rs:78-240). Applied
    symmetrically (x in a & y in b, or swapped). Each side consumes 1 or
    2 chars (the reference's op shapes: 2↔1 digraphs, 1↔2 splits, 2↔2
    handled by ``transpose``); weights must be > 0 — a free multi-char
    rewrite would make the blocking envelope unbounded, exactly like a
    zero-weight indel."""

    insert: float = 1.0
    delete: float = 1.0
    substitute: float = 1.0
    transpose: float | None = None
    restricted: tuple = field(default_factory=tuple)
    string_ops: tuple = field(default_factory=tuple)

    def __post_init__(self):
        if self.insert <= 0 or self.delete <= 0:
            # Theorem 8.2 analog: length-changing ops must cost > 0
            raise ValueError("insert/delete weights must be > 0")
        if self.substitute < 0 or (self.transpose is not None and self.transpose < 0):
            raise ValueError("weights must be non-negative")
        for pairs, w in self.restricted:
            if w < 0:
                raise ValueError("restricted class weight must be >= 0")
        for x, y, w in self.string_ops:
            if not (1 <= len(x) <= 2 and 1 <= len(y) <= 2):
                raise ValueError(
                    f"string op ({x!r}, {y!r}) sides must consume 1 or 2 "
                    f"chars (reference op shapes; 2↔2 swaps are 'transpose')")
            if w <= 0:
                raise ValueError("string op weights must be > 0")

    @classmethod
    def phonetic_digraphs(cls, weight: float = 0.15) -> "WeightedOps":
        """Digraph rewrites at reduced cost (operation_set.rs phonetic
        example ph→f ⟨2,1,0.15⟩ and friends)."""
        return cls(string_ops=(("ph", "f", weight), ("ck", "k", weight),
                               ("gh", "g", weight)))

    def sub_cost(self, x: str, y: str) -> float:
        if x == y:
            return 0.0
        c = self.substitute
        for pairs, w in self.restricted:
            if (x, y) in pairs or (y, x) in pairs:
                c = min(c, w)
        return c

    @classmethod
    def standard(cls) -> "WeightedOps":
        return cls()

    @classmethod
    def ocr(cls) -> "WeightedOps":
        """OCR confusions are cheap (operation_type.rs 'ocr_o_zero')."""
        pairs = frozenset({("o", "0"), ("l", "1"), ("i", "1"), ("s", "5"),
                           ("b", "8"), ("z", "2"), ("e", "c")})
        return cls(restricted=((pairs, 0.2),))

    @classmethod
    def keyboard(cls, slip_weight: float = 0.5) -> "WeightedOps":
        """Adjacent-key slips at reduced cost, swaps at reduced cost."""
        rows = ["qwertyuiop", "asdfghjkl", "zxcvbnm"]
        pairs = set()
        for row in rows:
            pairs.update((row[i], row[i + 1]) for i in range(len(row) - 1))
        return cls(transpose=slip_weight, restricted=((frozenset(pairs), slip_weight),))


def weighted_distance_py(a: str, b: str, ops: WeightedOps,
                         string_ops: tuple = ()) -> float:
    """Float-weighted edit distance, O(mn) reference oracle.

    ``string_ops`` adds the reference's multi-char restricted operations:
    tuples (x_str, y_str, weight) applied when a/b locally end with
    x_str/y_str — e.g. ("ph", "f", 0.15) (operation_set.rs phonetic
    example). Applied in BOTH directions (x in a & y in b, or swapped),
    matching SubstitutionSet.allow_str symmetry. Defaults to
    ``ops.string_ops`` when not given explicitly."""
    string_ops = tuple(string_ops) or ops.string_ops
    m, n = len(a), len(b)
    big = float("inf")
    D = [[big] * (n + 1) for _ in range(m + 1)]
    D[0][0] = 0.0
    for i in range(m + 1):
        for j in range(n + 1):
            if i == 0 and j == 0:
                continue
            best = big
            if i > 0:
                best = min(best, D[i - 1][j] + ops.delete)
            if j > 0:
                best = min(best, D[i][j - 1] + ops.insert)
            if i > 0 and j > 0:
                best = min(best, D[i - 1][j - 1] + ops.sub_cost(a[i - 1], b[j - 1]))
            if (ops.transpose is not None and i > 1 and j > 1
                    and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]
                    and a[i - 1] != a[i - 2]):
                best = min(best, D[i - 2][j - 2] + ops.transpose)
            for x, y, w in string_ops:
                lx, ly = len(x), len(y)
                if i >= lx and j >= ly and a[i - lx:i] == x and b[j - ly:j] == y:
                    best = min(best, D[i - lx][j - ly] + w)
                if i >= ly and j >= lx and a[i - ly:i] == y and b[j - lx:j] == x:
                    best = min(best, D[i - ly][j - lx] + w)
            D[i][j] = best
    return D[m][n]


def _restricted_keys(ops: WeightedOps):
    """Per class: sorted uint64 key array of (cp, cp) in both directions."""
    out = []
    for pairs, w in ops.restricted:
        ks = set()
        for x, y in pairs:
            ks.add((ord(x) << 32) | ord(y))
            ks.add((ord(y) << 32) | ord(x))
        out.append((np.sort(np.fromiter(ks, dtype=np.uint64, count=len(ks))),
                    float(w)))
    return out


def weighted_batch_distance(a: pd.Series, b: pd.Series, max_cost: float,
                            ops: WeightedOps) -> np.ndarray:
    """Banded float DP across a batch. Returns float64: the exact cost
    where <= max_cost, else ``max_cost + 1.0``.

    Band half-width h = floor(max_cost / cheapest per-unit length
    change): a cell at diagonal offset |k| needs |k| units of net length
    change, each costing >= min(insert, delete, cheapest UNEVEN string
    op) — a ⟨2,1⟩ digraph changes length by 1 at its own weight, so the
    band must widen when such ops undercut the indels. The weighted
    version of the unit kernel's 2n+1 band.

    ``ops.string_ops`` ⟨consume_x, consume_y, weight⟩ transitions read
    row i-len(x) at band slot k + len(x) - len(y) (both directions, like
    the py oracle); with sides consuming 1..2 chars only the prev /
    two-ago rows the transpose path already keeps are needed."""
    from liblevenshtein_rust_spark.functions.distance import _encode_batch

    B = len(a)
    sent = float(max_cost) + _SENTINEL_PAD
    out = np.full(B, sent, dtype=np.float64)
    if B == 0:
        return out
    uneven = [w for x, y, w in ops.string_ops if len(x) != len(y)]
    grow_unit = min([ops.insert] + uneven)     # cheapest +1 length / unit
    shrink_unit = min([ops.delete] + uneven)   # cheapest -1 length / unit
    h = int(np.floor(max_cost / min(grow_unit, shrink_unit)))
    W = 2 * h + 1
    rk = _restricted_keys(ops)
    # both directions, pre-encoded: (len_x, len_y, x codepoints,
    # y codepoints, weight)
    sops = []
    for x, y, w in ops.string_ops:
        for xs, ys in {(x, y), (y, x)}:
            sops.append((len(xs), len(ys), [ord(c) for c in xs],
                         [ord(c) for c in ys], float(w)))
    BIG = np.float64(1e30)

    ac, al = _encode_batch(a)
    bc, bl = _encode_batch(b)
    if ac.dtype != bc.dtype:
        ac = ac.astype(np.uint32)
        bc = bc.astype(np.uint32)
    al = al.astype(np.int64)
    bl = bl.astype(np.int64)

    out[(al == 0) & (bl == 0)] = 0.0
    # string ops consume >= 1 char on BOTH sides, so empty-side rows are
    # pure indel chains regardless of sops
    only_b = (al == 0) & (bl > 0)
    only_a = (bl == 0) & (al > 0)
    vb = bl[only_b] * ops.insert
    out[only_b] = np.where(vb <= max_cost + 1e-9, vb, sent)
    va = al[only_a] * ops.delete
    out[only_a] = np.where(va <= max_cost + 1e-9, va, sent)
    active = ((al > 0) & (bl > 0)
              & ((bl - al) * grow_unit <= max_cost + 1e-12)
              & ((al - bl) * shrink_unit <= max_cost + 1e-12))
    if not active.any():
        return out
    idx = np.nonzero(active)[0]
    ac, al, bc, bl = ac[idx], al[idx], bc[idx], bl[idx]
    Ba = ac.shape[0]
    lmax_b = bc.shape[1]
    kk = np.arange(W)[None, :]

    def subw(a_chars, b_chars):
        """Elementwise substitution cost matrix."""
        c = np.where(a_chars == b_chars, 0.0, float(ops.substitute))
        if rk:
            key = (a_chars.astype(np.uint64) << np.uint64(32)) | b_chars.astype(np.uint64)
            neq = a_chars != b_chars
            for keys, w in rk:
                hit = neq & np.isin(key, keys)
                c = np.where(hit, np.minimum(c, w), c)
        return c

    # row i=0: D[0][j] = j * insert at band slot k = j + h
    row = np.where(kk >= h, (kk - h) * ops.insert, BIG)
    row = np.broadcast_to(row, (Ba, W)).copy()
    row[np.broadcast_to(kk - h, row.shape) > bl[:, None]] = BIG
    prev = row
    two_ago = np.full((Ba, W), BIG)
    res = np.full(Ba, sent)
    done = np.zeros(Ba, dtype=bool)
    imax = int(al.max())

    for i in range(1, imax + 1):
        jb = np.broadcast_to(i + kk - h, (Ba, W))
        valid = (jb >= 0) & (jb <= bl[:, None]) & (i <= al)[:, None]
        a_i = ac[:, i - 1][:, None] if i - 1 < ac.shape[1] else \
            np.zeros((Ba, 1), ac.dtype)
        jm1 = np.clip(jb - 1, 0, max(lmax_b - 1, 0))
        b_j = np.take_along_axis(bc, jm1, axis=1) if lmax_b else \
            np.zeros((Ba, W), bc.dtype)
        scost = np.where(jb >= 1, subw(np.broadcast_to(a_i, b_j.shape), b_j), BIG)

        up = np.concatenate([prev[:, 1:], np.full((Ba, 1), BIG)], axis=1)
        best = np.minimum(up + ops.delete, prev + scost)

        if ops.transpose is not None and i >= 2:
            jm2 = np.clip(jb - 2, 0, max(lmax_b - 1, 0))
            b_jm1 = np.take_along_axis(bc, jm2, axis=1) if lmax_b else b_j
            a_im1 = ac[:, i - 2][:, None]
            tr_ok = ((np.broadcast_to(a_i, b_jm1.shape) == b_jm1)
                     & (np.broadcast_to(a_im1, b_j.shape) == b_j)
                     & (np.broadcast_to(a_i, b_j.shape)
                        != np.broadcast_to(a_im1, b_j.shape))
                     & (jb >= 2))
            best = np.where(tr_ok, np.minimum(best, two_ago + ops.transpose), best)

        for lx, ly, xcodes, ycodes, w in sops:
            if i < lx:
                continue
            # a-side chars a[i-lx .. i-1] == x: one bool per batch row
            a_ok = np.ones(Ba, dtype=bool)
            for t, code in enumerate(xcodes):
                a_ok &= ac[:, i - lx + t] == code
            if not a_ok.any():
                continue
            # b-side chars b[j-ly .. j-1] == y: per band slot
            b_ok = jb >= ly
            for t, code in enumerate(ycodes):
                jcol = np.clip(jb - ly + t, 0, max(lmax_b - 1, 0))
                bchar = np.take_along_axis(bc, jcol, axis=1) if lmax_b \
                    else np.zeros((Ba, W), bc.dtype)
                b_ok = b_ok & (bchar == code)
            # source = row i-lx at slot k + lx - ly
            src_row = prev if lx == 1 else two_ago
            s = lx - ly
            if s == 0:
                src = src_row
            elif s > 0:
                src = np.concatenate(
                    [src_row[:, s:], np.full((Ba, s), BIG)], axis=1)
            else:
                src = np.concatenate(
                    [np.full((Ba, -s), BIG), src_row[:, :s]], axis=1)
            mask = a_ok[:, None] & b_ok & valid
            best = np.where(mask, np.minimum(best, src + w), best)

        curr = np.where(valid, best, BIG)
        for k in range(1, W):
            curr[:, k] = np.minimum(curr[:, k], curr[:, k - 1] + ops.insert)
        curr = np.where(valid, curr, BIG)

        fin = (al == i) & ~done
        if fin.any():
            kfin = (bl[fin] - i + h).astype(np.int64)
            vals = curr[fin, np.clip(kfin, 0, W - 1)]
            r = np.where((kfin >= 0) & (kfin < W), vals, BIG)
            res[fin] = np.where(r <= max_cost + 1e-9, r, sent)
            done[fin] = True
        if done.all():
            break
        two_ago, prev = prev, curr

    out[idx] = res
    return out


@lru_cache(maxsize=None)
def make_weighted_distance_udf(max_cost: float, ops: WeightedOps):
    """pandas UDF (a, b) -> double weighted cost (sentinel above
    max_cost). ``ops`` is hashable (frozen dataclass) for plan reuse."""
    from pyspark.sql.functions import pandas_udf

    mc = float(max_cost)

    @pandas_udf("double")
    def _wdist(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(weighted_batch_distance(a, b, mc, ops))

    # single-evaluation fence against the filter-below-projection UDF
    # duplication (guide §4.4; see functions/distance.make_distance_udf)
    return _wdist.asNondeterministic()

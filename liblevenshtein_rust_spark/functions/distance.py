"""Distance kernels: the per-row invariant anchor of the whole engine.

Three edit-distance variants with semantics matching the reference library's
(``/root/reference/src/distance/mod.rs``):

- ``standard`` — Levenshtein (insert/delete/substitute), char-level
  (``standard_distance_impl``, distance/mod.rs:245-288).
- ``transposition`` — Damerau-Levenshtein with adjacent-swap = 1 edit
  (``transposition_distance``, distance/mod.rs:304-359).
- ``merge_and_split`` — adds merge (2 chars -> 1) and split (1 char -> 2),
  each cost 1 (``merge_and_split_distance``, distance/mod.rs:624-730; the
  OCR-error metric). NOTE the reference's deliberate semantics: when the
  leading chars are equal the recursion takes *only* the diagonal — ported
  exactly (see test vector rn<->m = 1).

Two implementations, cross-validated in tests (mirroring the reference's
recursive-vs-iterative cross check at distance/mod.rs:817-869):

1. Pure-Python DPs (`*_py`) — slow, obviously-correct oracles.
2. ``batch_distance`` — a numpy *banded* DP vectorized across a whole Arrow
   batch of pairs (the batch dimension plays the role the reference's SIMD
   lanes play, src/distance/simd.rs). Cost O(Lmax * (2n+1)) numpy ops per
   batch, independent of batch size; band width 2n+1 mirrors the automaton's
   bounded-diagonal guarantee (states <= 8 positions, src/transducer/state.rs).

All operate on Unicode codepoints, never bytes (distance/mod.rs:245-246).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

STANDARD = "standard"
TRANSPOSITION = "transposition"
MERGE_AND_SPLIT = "merge_and_split"
VARIANTS = (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT)

_INF = np.int32(2**30)


# ---------------------------------------------------------------------------
# Pure-Python oracles
# ---------------------------------------------------------------------------

def normalize_pairs(subst_pairs) -> frozenset | None:
    """Normalize any accepted substitution spec to codepoint pairs.

    Accepts a SubstitutionSet, an iterable of char pairs, or an iterable
    of codepoint pairs — mixing conventions used to silently disable the
    zero-cost substitutions (frozenset membership never matched); now every
    entry point converges on codepoints and raises on garbage."""
    if subst_pairs is None:
        return None
    if hasattr(subst_pairs, "codepoint_pairs"):  # SubstitutionSet
        subst_pairs = subst_pairs.codepoint_pairs()
    out = set()
    for a, b in subst_pairs:
        ca = ord(a) if isinstance(a, str) else int(a)
        cb = ord(b) if isinstance(b, str) else int(b)
        out.add((ca, cb))
    return frozenset(out) or None


def _mk_eq(subst_pairs=None):
    """Equality predicate (over chars) extended with zero-cost substitution
    pairs (the reference's Restricted policy, substitution_policy.rs:128)."""
    ps = normalize_pairs(subst_pairs)
    if not ps:
        return lambda x, y: x == y
    return lambda x, y: x == y or (ord(x), ord(y)) in ps or (ord(y), ord(x)) in ps


def levenshtein_py(a: str, b: str, subst_pairs=None) -> int:
    """Standard Levenshtein distance (two-row DP, codepoint-level)."""
    if a == b:
        return 0
    eq = _mk_eq(subst_pairs)
    m, n = len(a), len(b)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        curr = [i] + [0] * n
        ca = a[i - 1]
        for j in range(1, n + 1):
            cost = 0 if eq(ca, b[j - 1]) else 1
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
        prev = curr
    return prev[n]


def transposition_py(a: str, b: str, subst_pairs=None) -> int:
    """Damerau-Levenshtein (adjacent transposition = 1 edit; 3-row DP,
    restricted/OSA variant like the reference's transposition_distance)."""
    if a == b:
        return 0
    eq = _mk_eq(subst_pairs)
    m, n = len(a), len(b)
    if m == 0:
        return n
    if n == 0:
        return m
    two_ago = [0] * (n + 1)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        curr = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if eq(a[i - 1], b[j - 1]) else 1
            d = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and eq(a[i - 1], b[j - 2]) and eq(a[i - 2], b[j - 1]):
                d = min(d, two_ago[j - 2] + 1)
            curr[j] = d
        two_ago, prev = prev, curr
    return prev[n]


def merge_and_split_py(a: str, b: str) -> int:
    """Merge-and-split distance, semantics ported from the reference.

    Recurrence (derived from the reference's recursion,
    /root/reference/src/distance/mod.rs:624-730):

      D[i][j] = D[i-1][j-1]                        if a[i-1] == b[j-1]
              = 1 + min(D[i-1][j],   # delete
                        D[i][j-1],   # insert
                        D[i-1][j-1], # substitute
                        D[i-1][j-2], # split: 1 source char -> 2 target chars
                        D[i-2][j-1]) # merge: 2 source chars -> 1 target char
                                     otherwise

    The equal-char case takes ONLY the diagonal (no min with other ops) —
    this is the reference's (and the original C++ library's) behavior.
    """
    if a == b:
        return 0
    m, n = len(a), len(b)
    if m == 0:
        return n
    if n == 0:
        return m
    big = 1 << 30
    # rows: D[i-2], D[i-1], D[i]
    two_ago = [big] * (n + 1)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        curr = [i] + [big] * n
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                curr[j] = prev[j - 1]
            else:
                d = min(prev[j], curr[j - 1], prev[j - 1])
                if j >= 2:
                    d = min(d, prev[j - 2])
                if i >= 2:
                    d = min(d, two_ago[j - 1])
                curr[j] = d + 1
        two_ago, prev = prev, curr
    return prev[n]


def distance_py(a: str, b: str, variant: str = STANDARD) -> int:
    if variant == STANDARD:
        return levenshtein_py(a, b)
    if variant == TRANSPOSITION:
        return transposition_py(a, b)
    if variant == MERGE_AND_SPLIT:
        return merge_and_split_py(a, b)
    raise ValueError(f"unknown variant {variant!r}")


# ---------------------------------------------------------------------------
# Vectorized batch kernel
# ---------------------------------------------------------------------------

def _encode_unique(strings) -> tuple[np.ndarray, np.ndarray]:
    """list/array of unique strings -> (codes [U, Lmax] uint32, lengths [U]).

    utf-32-le encode + one frombuffer over the concatenation — no
    per-character Python. Row-major masked scatter places each string's
    codepoints without any index arithmetic (mask order == concat order).
    """
    lens = np.fromiter((len(x) for x in strings), dtype=np.int32,
                       count=len(strings))
    U = len(strings)
    lmax = int(lens.max()) if U else 0
    out = np.zeros((U, max(lmax, 1)), dtype=np.uint32)
    if lmax:
        joined = "".join(strings)
        codes_flat = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
        mask = np.arange(lmax, dtype=np.int32)[None, :] < lens[:, None]
        out[:, :lmax][mask] = codes_flat
        if codes_flat.size and int(codes_flat.max()) < 256:
            # Latin-1-only batch: 4x less memory traffic in the DP passes
            out = out.astype(np.uint8)
    return out, lens


def _encode_batch(texts: pd.Series, with_reversed: bool = False):
    """Series of strings -> (codes [B, Lmax] uint32, lengths [B]
    [, reversed codes [B, Lmax]]).

    Candidate batches repeat the same terms many times (each dictionary
    term joins several pairs), so encode unique strings once and gather —
    a large constant-factor win over per-row encoding. The reversed
    matrix makes common-suffix detection a cheap left-aligned compare.
    """
    s = texts.fillna("").astype(str)
    codes, uniques = pd.factorize(s)
    ulist = list(uniques)
    uc, ul = _encode_unique(ulist)
    if not with_reversed:
        return uc[codes], ul[codes]
    ur, _ = _encode_unique([x[::-1] for x in ulist])
    return uc[codes], ul[codes], ur[codes]


def _pair_keys(subst_pairs) -> np.ndarray | None:
    """substitution spec (any convention) -> sorted uint64 key array (both
    directions), for vectorized membership tests."""
    subst_pairs = normalize_pairs(subst_pairs)
    if not subst_pairs:
        return None
    ks = set()
    for x, y in subst_pairs:
        ks.add((int(x) << 32) | int(y))
        ks.add((int(y) << 32) | int(x))
    return np.sort(np.fromiter(ks, dtype=np.uint64, count=len(ks)))


def _eqmat(a: np.ndarray, b: np.ndarray, pair_keys: np.ndarray | None) -> np.ndarray:
    """Elementwise extended equality (== or whitelisted substitution)."""
    eq = a == b
    if pair_keys is not None:
        k = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        eq |= np.isin(k, pair_keys)
    return eq


def _strip_common_affixes(
    ac: np.ndarray, al: np.ndarray, ar: np.ndarray,
    bc: np.ndarray, bl: np.ndarray, br: np.ndarray,
    pair_keys: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch analog of the reference's strip_common_affixes
    (/root/reference/src/distance/mod.rs:111-147): returns re-packed,
    left-aligned codepoint matrices with shared prefix/suffix removed.

    ``ar``/``br`` hold the reversed strings, so the common suffix is the
    leading equal run of the reversed matrices — every comparison is a
    sequential left-aligned pass, no per-row index gathers.
    """
    B = ac.shape[0]
    if B == 0:
        return ac, al, bc, bl
    lmax = max(ac.shape[1], bc.shape[1], 1)
    if ac.shape[1] < lmax:
        ac = np.pad(ac, ((0, 0), (0, lmax - ac.shape[1])))
        ar = np.pad(ar, ((0, 0), (0, lmax - ar.shape[1])))
    if bc.shape[1] < lmax:
        bc = np.pad(bc, ((0, 0), (0, lmax - bc.shape[1])))
        br = np.pad(br, ((0, 0), (0, lmax - br.shape[1])))
    cols = np.arange(lmax, dtype=np.int32)[None, :]
    minl = np.minimum(al, bl).astype(np.int32)
    # prefix: length of the leading equal run (within min length)
    eq = _eqmat(ac, bc, pair_keys)
    eq &= cols < minl[:, None]
    pref = np.logical_and.accumulate(eq, axis=1).sum(axis=1, dtype=np.int32)
    # suffix: leading equal run of the reversed strings, not overlapping
    # the prefix
    req = _eqmat(ar, br, pair_keys)
    req &= cols < (minl - pref)[:, None]
    suff = np.logical_and.accumulate(req, axis=1).sum(axis=1, dtype=np.int32)
    na = al - pref - suff
    nb = bl - pref - suff
    # re-pack: gather codes[pref : pref+len] to the left edge; residuals are
    # short for near-dup pairs, so this gather touches few columns
    new_lmax = int(max(na.max(), nb.max(), 0)) if B else 0
    ncols = np.arange(max(new_lmax, 1), dtype=np.int32)[None, :]
    gidx = np.clip(pref[:, None] + ncols, 0, lmax - 1)
    ga = np.take_along_axis(ac, gidx, axis=1)
    gb = np.take_along_axis(bc, gidx, axis=1)
    ga[ncols >= na[:, None]] = 0
    gb[ncols >= nb[:, None]] = 0
    return ga[:, :max(new_lmax, 1)], na, gb[:, :max(new_lmax, 1)], nb


def batch_prefix_distance(
    q: pd.Series,
    t: pd.Series,
    max_distance: int,
    variant: str = STANDARD,
    subst_pairs=None,
) -> np.ndarray:
    """Prefix (autocomplete) distance: min over prefixes p of t of d(q, p).

    The reference's prefix query mode — characters past the query's end
    match free (/root/reference/src/transducer/transition.rs:189-192,
    infer_prefix_distance at state.rs:264-281). Returns the exact value
    when <= max_distance, else max_distance + 1.
    """
    n = int(max_distance)
    B = len(q)
    out = np.full(B, n + 1, dtype=np.int32)
    if B == 0:
        return out
    pk = _pair_keys(subst_pairs)
    ac, al = _encode_batch(q)
    bc, bl = _encode_batch(t)
    if ac.dtype != bc.dtype:
        ac = ac.astype(np.uint32)
        bc = bc.astype(np.uint32)
    # a prefix longer than |q|+n can never be within n
    bl = np.minimum(bl, al + n)
    out[al == 0] = 0                       # empty query matches empty prefix
    only_a = (bl == 0) & (al > 0)
    out[only_a] = np.minimum(al[only_a], n + 1)
    active = (al > 0) & (bl > 0) & (al - bl <= n)
    if not active.any():
        return out
    idx = np.nonzero(active)[0]
    res = _banded_dp(ac[idx], al[idx], bc[idx], bl[idx], n, variant, pk,
                     prefix=True)
    out[idx] = res
    return out


def batch_distance(
    a: pd.Series,
    b: pd.Series,
    max_distance: int,
    variant: str = STANDARD,
    subst_pairs=None,
) -> np.ndarray:
    """Banded DP distance for a batch of pairs, vectorized across the batch.

    Returns int32 array: the exact distance where it is <= max_distance,
    else ``max_distance + 1`` (a "greater than threshold" sentinel — callers
    filter on ``dist <= n``). Band width 2n+1; cells outside the band can
    never fall back under the threshold, mirroring the automaton's bounded
    diagonal (/root/reference/src/transducer/state.rs:14-41).
    """
    if variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}")
    n = int(max_distance)
    B = len(a)
    out = np.full(B, n + 1, dtype=np.int32)
    if B == 0:
        return out

    pk = _pair_keys(subst_pairs)
    ac, al, ar = _encode_batch(a, with_reversed=True)
    bc, bl, br = _encode_batch(b, with_reversed=True)
    if ac.dtype != bc.dtype:  # one side non-ASCII: promote both
        ac, ar = ac.astype(np.uint32), ar.astype(np.uint32)
        bc, br = bc.astype(np.uint32), br.astype(np.uint32)
    ac, al, bc, bl = _strip_common_affixes(ac, al, ar, bc, bl, br, pk)

    # identical after stripping
    out[(al == 0) & (bl == 0)] = 0
    # one side empty → distance = other length (all variants agree)
    only_a = (al == 0) & (bl > 0)
    only_b = (bl == 0) & (al > 0)
    out[only_a] = np.minimum(bl[only_a], n + 1)
    out[only_b] = np.minimum(al[only_b], n + 1)

    # length pruning: |la-lb| > n ⇒ dist > n for every variant
    active = (al > 0) & (bl > 0) & (np.abs(al - bl) <= n)
    if not active.any():
        return out
    idx = np.nonzero(active)[0]
    # orient so a is the shorter side (all three metrics are symmetric;
    # merge/split swap into each other under transposition of args)
    sa, sla = ac[idx], al[idx]
    sb, slb = bc[idx], bl[idx]
    swap = sla > slb
    if swap.any():
        sa[swap], sb[swap] = sb[swap].copy(), sa[swap].copy()
        sla[swap], slb[swap] = slb[swap].copy(), sla[swap].copy()

    res = _banded_dp(sa, sla, sb, slb, n, variant, pk)
    out[idx] = res
    return out


def _banded_dp(
    ac: np.ndarray, al: np.ndarray, bc: np.ndarray, bl: np.ndarray,
    n: int, variant: str, pair_keys: np.ndarray | None = None,
    prefix: bool = False,
) -> np.ndarray:
    """Core banded DP over band coordinates Dk[i, k] = D[i, i + k - n].

    Shapes: ac [B, La], bc [B, Lb]; returns [B] int32 (n+1 = over threshold).
    Loop is over string positions only — every op inside is a [B, 2n+1]
    numpy expression, so the work per DP cell is amortized across the batch.
    """
    B = ac.shape[0]
    W = 2 * n + 1
    kk = np.arange(W)[None, :]          # band offset axis
    imax = int(al.max())
    lmax_b = bc.shape[1]

    res = np.full(B, n + 1, dtype=np.int32)
    trans = variant == TRANSPOSITION
    ms = variant == MERGE_AND_SPLIT

    # row i=0: D[0][j] = j  → Dk[0, k] = k - n for k >= n else invalid
    row = np.where(kk >= n, kk - n, _INF).astype(np.int32)
    row = np.broadcast_to(row, (B, W)).copy()
    jvals0 = kk - n  # j at row 0
    row[np.broadcast_to(jvals0 > bl[:, None], row.shape)] = _INF

    # capture answers for pairs whose a-length is 0 handled by caller
    prev = row                       # D[i-1]
    two_ago = np.full((B, W), _INF, dtype=np.int32)  # D[i-2]
    # previous rows of characters for transposition/merge checks
    done = np.zeros(B, dtype=bool)

    for i in range(1, imax + 1):
        j = i + kk - n               # actual column per band slot, [1,W]→[B?]
        jb = np.broadcast_to(j, (B, W))
        valid = (jb >= 0) & (jb <= bl[:, None]) & (i <= al)[:, None]

        # character comparison a[i-1] vs b[j-1]
        a_i = ac[:, i - 1][:, None] if i - 1 < ac.shape[1] else np.zeros((B, 1), np.uint32)
        jm1 = np.clip(jb - 1, 0, max(lmax_b - 1, 0))
        b_j = np.take_along_axis(bc, jm1, axis=1) if lmax_b else np.zeros((B, W), np.uint32)
        eq = _eqmat(np.broadcast_to(a_i, b_j.shape), b_j, pair_keys) & (jb >= 1)

        # neighbors in band coords:
        #   D[i-1][j]   = prev[k+1]
        #   D[i][j-1]   = curr[k-1]  (handled via left-to-right scan)
        #   D[i-1][j-1] = prev[k]
        up = np.concatenate([prev[:, 1:], np.full((B, 1), _INF, np.int32)], axis=1)
        diag = prev

        cost = np.where(eq, 0, 1).astype(np.int32)
        best = np.minimum(up + 1, diag + cost)

        if trans and i >= 2:
            # D[i-2][j-2] = two_ago[k]; need a[i-1]==b[j-2] and a[i-2]==b[j-1]
            jm2 = np.clip(jb - 2, 0, max(lmax_b - 1, 0))
            b_jm1 = np.take_along_axis(bc, jm2, axis=1) if lmax_b else b_j
            a_im1 = ac[:, i - 2][:, None]
            tr_ok = (
                _eqmat(np.broadcast_to(a_i, b_jm1.shape), b_jm1, pair_keys)
                & _eqmat(np.broadcast_to(a_im1, b_j.shape), b_j, pair_keys)
                & (jb >= 2)
            )
            best = np.where(tr_ok, np.minimum(best, two_ago + 1), best)

        if ms:
            # reference semantics: equal chars take ONLY the diagonal
            # split: D[i-1][j-2] = prev[k-1]; merge: D[i-2][j-1] = two_ago[k+1]
            split = np.concatenate([np.full((B, 1), _INF, np.int32), prev[:, :-1]], axis=1)
            merge = (
                np.concatenate([two_ago[:, 1:], np.full((B, 1), _INF, np.int32)], axis=1)
                if i >= 2 else np.full((B, W), _INF, np.int32)
            )
            best_ne = np.minimum(best, np.minimum(split + 1, merge + 1))
            best = np.where(eq, diag, best_ne)

        # insertion D[i][j-1] needs a left-to-right pass within the row:
        # row[k] = min(row[k], row[k-1] + 1); W <= 7 so this tiny loop is
        # over band slots, still vectorized over the batch.
        curr = np.where(valid, best, _INF)
        for k in range(1, W):
            curr[:, k] = np.minimum(curr[:, k], curr[:, k - 1] + 1)
        curr = np.where(valid, np.minimum(curr, _INF), _INF).astype(np.int32)

        # harvest rows that finish at i == la
        fin = (al == i) & ~done
        if fin.any():
            if prefix:
                # prefix mode: best over all prefixes = min over the final
                # DP row (invalid cells are INF already)
                r = curr[fin].min(axis=1)
            else:
                kfin = bl[fin] - i + n  # k = lb - la + n, in [0, W) as |Δ|<=n
                vals = curr[fin, np.clip(kfin, 0, W - 1)]
                r = np.where((kfin >= 0) & (kfin < W), vals, _INF)
            res[fin] = np.minimum(r, n + 1).astype(np.int32)
            done[fin] = True
        if done.all():
            break
        two_ago, prev = prev, curr

    return res


# ---------------------------------------------------------------------------
# pandas UDF factory
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def make_distance_udf(max_distance: int, variant: str = STANDARD,
                      subst_pairs: frozenset | None = None):
    """Return a pandas UDF (a: str, b: str) -> int distance.

    Values above ``max_distance`` are reported as ``max_distance + 1``;
    callers filter ``dist <= n``. ``subst_pairs`` is a frozenset of
    codepoint pairs treated as zero-cost substitutions (Restricted
    policy). Arrow-batched — the only Python in the engine's hot path.
    """
    from pyspark.sql.functions import pandas_udf

    n = int(max_distance)
    var = str(variant)
    sp = subst_pairs

    @pandas_udf("int")
    def _dist(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(batch_distance(a, b, n, var, sp))

    # the kernel IS deterministic; the marker is the documented optimizer
    # fence (guide §4.4) against duplicated evaluation: the filter on the
    # UDF-computed distance otherwise plans a second ArrowEvalPython below
    # the filter (profiled: every variant join paid the Arrow kernel twice)
    return _dist.asNondeterministic()


@lru_cache(maxsize=None)
def make_prefix_distance_udf(max_distance: int, variant: str = STANDARD,
                             subst_pairs: frozenset | None = None):
    """pandas UDF (query, term) -> prefix distance (autocomplete mode)."""
    from pyspark.sql.functions import pandas_udf

    n = int(max_distance)
    var = str(variant)
    sp = subst_pairs

    @pandas_udf("int")
    def _pdist(q: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(batch_prefix_distance(q, t, n, var, sp))

    # see make_distance_udf: single-evaluation fence (guide §4.4)
    return _pdist.asNondeterministic()

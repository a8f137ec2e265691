"""Data-layout operators: Z-order (Morton) clustering for multi-column
locality.

At 100 TB the dominant cost of a selective query is how many files its
predicates let the scan SKIP.  Sorting on one column gives perfect
min/max pruning on that column and none on the others; interleaving the
bits of several columns (the Z-order / Morton curve) gives every
interleaved column partial pruning — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is pure integer arithmetic on Catalyst expressions
(shift/and/or — whole-stage codegen, no UDF), so the key carries an
exact DuckDB oracle and the clustering write is an ordinary
``repartitionByRange`` + ``sortWithinPartitions`` — Spark's scalable
total-order machinery, no custom partitioner.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pigpen_spark.relation import _to_col as _c


def zorder_key(cols: Sequence, bits: int = 16) -> Column:
    """Morton-interleaved key over ``cols`` (non-negative integers,
    truncated to the low ``bits`` bits each; len(cols) × bits ≤ 63).

    Bit ``i`` of column ``j`` lands at output bit ``i·n_cols + j`` — the
    classic Z-curve.  The expression expands to ``bits × n_cols``
    shift/and/or terms: all JVM-side, codegen'd, zero UDFs.  Callers with
    unbounded or skewed domains should pre-bucket (e.g. quantile bins)
    so the low ``bits`` bits carry signal; truncation keeps only the low
    bits, which preserves locality for dense ids but aliases sparse ones.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if n * bits > 63:
        raise ValueError(f"zorder_key: {n} cols × {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = _c(c).cast("long")
        for i in range(bits):
            # bit i of column j → output bit i*n + j
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return key


def zorder_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """DuckDB oracle for :func:`zorder_key` — same shift/and/or terms."""
    n = len(cols)
    terms = [
        f"((({c}::BIGINT >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


#: 2-D Hilbert state machine, derived mechanically from the classic
#: rotate/reflect algorithm (state = the dihedral transform pending on
#: all FUTURE bits; only 4 states are reachable) and verified
#: exhaustively against it in tests.  Entry index = state·4 + xbit·2 +
#: ybit; value packs (digit << 2) | next_state — one lookup per level
#: yields both outputs.
_HILBERT_CODE = [
    # state 0            state 1            state 2            state 3
    0 * 4 + 1, 1 * 4 + 0, 3 * 4 + 2, 2 * 4 + 0,
    0 * 4 + 0, 3 * 4 + 3, 1 * 4 + 1, 2 * 4 + 1,
    2 * 4 + 2, 1 * 4 + 2, 3 * 4 + 0, 0 * 4 + 3,
    2 * 4 + 3, 3 * 4 + 1, 1 * 4 + 3, 0 * 4 + 2,
]


def hilbert_key_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-Python model of :func:`hilbert_key` (tests + documentation)."""
    w = 0
    for i in range(bits - 1, -1, -1):
        idx = ((w & 3) << 2) | (((x >> i) & 1) << 1) | ((y >> i) & 1)
        cd = _HILBERT_CODE[idx]
        w = ((w >> 2) << 4) | ((cd >> 2) << 2) | (cd & 3)
    return w >> 2


def _hilbert_super_lut(k: int) -> list[int]:
    """Fuse ``k`` levels of the 4-state machine into one lookup:
    index = state·4^k + x_bits·2^k + y_bits (each the next k MSBs),
    value = (digits << 2) | next_state with digits the 2k output bits.
    4·4^k entries — k=4 is 1024 ints, still a constant-folded literal."""
    out = []
    for s in range(4):
        for xb in range(1 << k):
            for yb in range(1 << k):
                r, d = s, 0
                for i in range(k - 1, -1, -1):
                    idx = ((r & 3) << 2) | (((xb >> i) & 1) << 1) | ((yb >> i) & 1)
                    cd = _HILBERT_CODE[idx]
                    d = (d << 2) | (cd >> 2)
                    r = cd & 3
                out.append((d << 2) | r)
    return out


def hilbert_key(col_x, col_y, bits: int = 16) -> Column:
    """Hilbert-curve clustering key over two non-negative integer
    columns (low ``bits`` bits each; 2·bits ≤ 62) — the
    better-locality sibling of :func:`zorder_key`: the Hilbert curve
    never jumps (adjacent d values are always grid neighbors), so
    range-partitioned files get strictly tighter per-file min/max
    boxes than the Z-curve's quadrant seams allow.  This is the curve
    behind Delta/Iceberg liquid-style clustering.

    Arrow-batched: the 4-state machine walks all rows at once in int64
    numpy (one fancy-index lookup + shifts per level) — integer
    arithmetic, so equality with the expression form is exact, not a
    float contract (TestArrowHilbert pins it against
    :func:`hilbert_key_expr` and :func:`hilbert_key_py`).  The
    expression form pays ~1 µs/row per interpreted let-binding even
    with 4 levels fused per step; the numpy walk is ~ns/row/level.
    NULL in either column yields a NULL key (the expression form's
    NULL propagation).  Same pre-bucketing caveat as zorder_key: feed
    dense non-negative ints (quantile bins for unbounded domains)."""
    import numpy as np
    import pandas as pd

    if 2 * bits > 62:
        raise ValueError(f"hilbert_key: 2 x {bits} bits exceeds a signed long")
    code = _HILBERT_CODE

    def _key(xs, ys):
        if len(xs) == 0:
            return pd.Series([], dtype="Int64")
        C = np.asarray(code, dtype=np.int64)
        null = xs.isna().to_numpy() | ys.isna().to_numpy()
        x = xs.fillna(0).to_numpy(dtype=np.int64)
        y = ys.fillna(0).to_numpy(dtype=np.int64)
        w = np.zeros(len(xs), dtype=np.int64)
        for i in range(bits - 1, -1, -1):
            idx = ((w & 3) << 2) | (((x >> i) & 1) << 1) | ((y >> i) & 1)
            cd = C[idx]
            w = ((w >> 2) << 4) | ((cd >> 2) << 2) | (cd & 3)
        out = pd.Series(w >> 2, dtype="Int64")
        out[null] = None
        return out

    _key.__annotations__ = {"xs": pd.Series, "ys": pd.Series,
                            "return": pd.Series}
    return F.pandas_udf(_key, "long")(
        _c(col_x).cast("long"), _c(col_y).cast("long"))


def hilbert_key_expr(col_x, col_y, bits: int = 16) -> Column:
    """:func:`hilbert_key` as a pure Catalyst expression — the
    differential-test reference form (the shape
    :func:`hilbert_cte_sql` mirrors in DuckDB).

    Computed MSB-first through the 4-state machine above: per level,
    ONE literal-array lookup (constant-folded — the bloom_maybe_col
    lesson) yields the output digit and the next state; the running
    (d, state) pack into one long ``w = (d << 2) | r`` so each level
    is pure shift/and/or arithmetic.  Every level let-binds its inputs
    (``w`` and the code byte are each referenced twice), keeping the
    expression tree linear in ``bits`` — unbound, it would double per
    level.  Same pre-bucketing caveat as zorder_key: feed dense
    non-negative ints (quantile bins for unbounded domains)."""
    from pigpen_spark.functions.text import _let

    if 2 * bits > 62:
        raise ValueError(f"hilbert_key: 2 x {bits} bits exceeds a signed long")
    x = _c(col_x).cast("long")
    y = _c(col_y).cast("long")
    # fuse 4 levels per step (1024-entry folded literal): interpreted
    # HOF let-bindings cost ~1 µs each per row, so 4 steps instead of
    # 16 levels is a measured ~4× on the key scan; remainder levels
    # (bits % 4) run through the 1-level table
    k = 4
    super_lit = F.lit(_hilbert_super_lut(k))
    code_lit = F.lit(_HILBERT_CODE)
    w: Column = F.lit(0).cast("long")

    def step(i: int, kk: int, lut: Column):
        mask = (1 << kk) - 1

        def outer(ww: Column) -> Column:
            bx = F.shiftright(x, i).bitwiseAND(F.lit(mask))
            by = F.shiftright(y, i).bitwiseAND(F.lit(mask))
            idx = (F.shiftleft(ww.bitwiseAND(F.lit(3)), 2 * kk)
                   .bitwiseOR(F.shiftleft(bx, kk)).bitwiseOR(by))
            code = F.element_at(lut, (idx + F.lit(1)).cast("int"))

            def inner(cd: Column) -> Column:
                return (F.shiftleft(F.shiftright(ww, 2), 2 * kk + 2)
                        .bitwiseOR(F.shiftleft(F.shiftright(cd, 2), 2))
                        .bitwiseOR(cd.bitwiseAND(F.lit(3))))

            return _let(code.cast("long"), inner)

        return outer

    i = bits
    while i >= k:
        i -= k
        w = _let(w, step(i, k, super_lit))
    while i > 0:
        i -= 1
        w = _let(w, step(i, 1, code_lit))
    return F.shiftright(w, 2)


def hilbert_cte_sql(source_sql: str, keep_cols: Sequence[str], x_sql: str,
                    y_sql: str, out_col: str = "hkey",
                    bits: int = 16) -> str:
    """DuckDB oracle for :func:`hilbert_key`: the same state machine
    unrolled as one chained CTE per bit level over the source rows —
    NOT as nested lambda let-bindings, which make DuckDB's binder
    superlinear in depth (the unigram-oracle lesson).  Each stage's
    single-element list comprehension binds the code byte once.
    ``source_sql`` is a relation expression; ``keep_cols`` ride along."""
    code = "[" + ", ".join(str(c) for c in _HILBERT_CODE) + "]"
    keep = ", ".join(keep_cols)
    parts = [
        f"hsrc AS (SELECT {keep}, ({x_sql})::BIGINT AS hx, "
        f"({y_sql})::BIGINT AS hy FROM {source_sql})",
        f"w0 AS (SELECT {keep}, hx, hy, 0::BIGINT AS w FROM hsrc)",
    ]
    for n, i in enumerate(range(bits - 1, -1, -1), start=1):
        idx = (f"(((w & 3) << 2) | (((hx >> {i}) & 1) << 1) "
               f"| ((hy >> {i}) & 1))")
        parts.append(
            f"w{n} AS (SELECT {keep}, hx, hy, "
            f"[(((w >> 2) << 4) | (((cd >> 2) & 3) << 2) | (cd & 3))::BIGINT "
            f"for cd in [{code}[{idx} + 1]]][1] AS w FROM w{n - 1})")
    return ("WITH " + ",\n    ".join(parts)
            + f"\n    SELECT {keep}, (w >> 2)::BIGINT AS {out_col} FROM w{bits}")


# ---------------------------------------------------------------------------
# N-dimensional Hilbert key (Hamilton's compact-Hilbert construction)
# ---------------------------------------------------------------------------
#
# The 2-D machine above was derived by hand; for N dims the state machine
# is derived MECHANICALLY from Hamilton's Gray-code algorithm ("Compact
# Hilbert Indices", Dalhousie TR CS-2006-07; Butz 1971 is the ancestor):
# a state is the pending (entry-point e, direction d) transform, and BFS
# from the initial state reaches only 4 / 12 / 32 states for N = 2/3/4 —
# so the per-level transition stays one constant-folded literal-array
# lookup, exactly the 2-D plan shape.


def _gc(i: int) -> int:
    return i ^ (i >> 1)


def _gc_inv(g: int) -> int:
    i, j = g, 1
    while g >> j:
        i ^= g >> j
        j += 1
    return i


def _tob(i: int) -> int:  # trailing one-bits
    c = 0
    while i & 1:
        c += 1
        i >>= 1
    return c


def _hilbert_nd_machine(n: int) -> tuple[list[int], int, int]:
    """Flat transition table for the N-D Hilbert state machine:
    BFS-enumerate the reachable (e, d) states from (0, 0), then
    ``lut[s · 2^n + l] = (w << sb) | s_next`` with ``l`` the N input
    bits (dim j at bit j), ``w`` the output digit and ``sb`` the state
    width in bits.  Returns (lut, sb, n_states).  Deterministic: BFS
    order fixes state ids, so frozen keys never shift between runs."""
    mask = (1 << n) - 1

    def rotr(b: int, k: int) -> int:
        k %= n
        return ((b >> k) | (b << (n - k))) & mask

    def rotl(b: int, k: int) -> int:
        return rotr(b, n - (k % n))

    def entry(w: int) -> int:
        return 0 if w == 0 else _gc(2 * ((w - 1) // 2))

    def direction(w: int) -> int:
        if w == 0:
            return 0
        return _tob(w - 1) % n if w % 2 == 0 else _tob(w) % n

    ids: dict[tuple[int, int], int] = {(0, 0): 0}
    order: list[tuple[int, int]] = [(0, 0)]
    i = 0
    while i < len(order):
        e, d = order[i]
        i += 1
        for l in range(1 << n):
            t = rotr(l ^ e, d + 1)
            w = _gc_inv(t)
            e2 = e ^ rotl(entry(w), d + 1)
            d2 = (d + direction(w) + 1) % n
            if (e2, d2) not in ids:
                ids[(e2, d2)] = len(order)
                order.append((e2, d2))
    n_states = len(order)
    sb = max(1, (n_states - 1).bit_length())
    lut = [0] * (n_states << n)
    for (e, d), s in ids.items():
        for l in range(1 << n):
            t = rotr(l ^ e, d + 1)
            w = _gc_inv(t)
            e2 = e ^ rotl(entry(w), d + 1)
            d2 = (d + direction(w) + 1) % n
            lut[(s << n) | l] = (w << sb) | ids[(e2, d2)]
    return lut, sb, n_states


def _hilbert_nd_super_lut(n: int, k: int) -> tuple[list[int], int]:
    """Fuse ``k`` levels of the N-D machine into one lookup (the 2-D
    _hilbert_super_lut trick): index = s·2^(nk) + dim0_bits·2^((n-1)k)
    + … + dim_{n-1}_bits, value = (digits << sb) | next_state.  Sized
    n_states · 2^(n·k) — callers keep it ≲1000 entries so the literal
    array stays constant-folded and cheap (the element_at lesson)."""
    lut, sb, n_states = _hilbert_nd_machine(n)
    out = []
    for s in range(n_states):
        for grp in range(1 << (n * k)):
            # grp packs dim j's k bits at offset (n-1-j)·k (dim 0 MSB)
            st, d = s, 0
            for i in range(k - 1, -1, -1):
                l = 0
                for j in range(n):
                    bit = (grp >> ((n - 1 - j) * k + i)) & 1
                    l |= bit << j
                cd = lut[(st << n) | l]
                d = (d << n) | (cd >> sb)
                st = cd & ((1 << sb) - 1)
            out.append((d << sb) | st)
    return out, sb


def hilbert_key_nd_py(coords: Sequence[int], bits: int = 16) -> int:
    """Pure-Python model of :func:`hilbert_key_nd` (tests + docs)."""
    n = len(coords)
    lut, sb, _ = _hilbert_nd_machine(n)
    smask = (1 << sb) - 1
    w = 0
    for i in range(bits - 1, -1, -1):
        l = 0
        for j in range(n):
            l |= ((coords[j] >> i) & 1) << j
        cd = lut[((w & smask) << n) | l]
        w = ((w >> sb) << (n + sb)) | cd
    return w >> sb


def hilbert_key_nd(cols: Sequence, bits: int = 16) -> Column:
    """Hilbert-curve clustering key over N non-negative integer columns
    (low ``bits`` bits each) — the N-dimensional generalization of
    :func:`hilbert_key`, for layouts clustering on 3-4 columns at once
    (e.g. customer × day × price band).  Same no-jump guarantee per
    dimension pair (pinned by test).

    Arrow-batched like :func:`hilbert_key`: the 2^N-state machine's
    flat LUT walks all rows at once in int64 numpy — exact integer
    equality with :func:`hilbert_key_nd_expr` /
    :func:`hilbert_key_nd_py` (pinned), NULL in any column → NULL key.

    Capacity: N·bits digit bits + state bits must fit a signed long
    (N=3 allows bits ≤ 19, N=4 ≤ 14).  Same pre-bucketing caveat as
    zorder_key: feed dense non-negative ints."""
    import numpy as np
    import pandas as pd

    n = len(cols)
    if n < 2:
        raise ValueError("hilbert_key_nd: need at least two columns")
    lut, sb, _ = _hilbert_nd_machine(n)
    if n * bits + sb > 63:
        raise ValueError(
            f"hilbert_key_nd: {n} dims x {bits} bits + {sb} state bits "
            "exceeds a signed long")
    smask = (1 << sb) - 1

    def _key(sdf):
        if len(sdf) == 0:
            return pd.Series([], dtype="Int64")
        L = np.asarray(lut, dtype=np.int64)
        names = [f"d{j}" for j in range(n)]
        null = np.zeros(len(sdf), dtype=bool)
        for c in names:
            null |= sdf[c].isna().to_numpy()
        dims = [sdf[c].fillna(0).to_numpy(dtype=np.int64) for c in names]
        w = np.zeros(len(sdf), dtype=np.int64)
        for i in range(bits - 1, -1, -1):
            l = np.zeros_like(w)
            for j, d in enumerate(dims):
                l |= ((d >> i) & 1) << j
            cd = L[((w & smask) << n) | l]
            w = ((w >> sb) << (n + sb)) | cd
        out = pd.Series(w >> sb, dtype="Int64")
        out[null] = None
        return out

    _key.__annotations__ = {"sdf": pd.DataFrame, "return": pd.Series}
    return F.pandas_udf(_key, "long")(F.struct(
        *[_c(c).cast("long").alias(f"d{j}") for j, c in enumerate(cols)]))


def hilbert_key_nd_expr(cols: Sequence, bits: int = 16) -> Column:
    """:func:`hilbert_key_nd` as a pure Catalyst expression — the
    differential-test reference form (the shape
    :func:`hilbert_nd_cte_sql` mirrors in DuckDB): per step one
    constant-folded literal-array lookup through the rolling
    ``w = (digits << sb) | state`` pack, let-bound so the expression
    tree stays linear in ``bits``.  Levels are fused ``k`` per step
    with the largest k that keeps the fused table ≤ 1024 entries
    (N=3 → k=2, 768 entries; N=4 → k=1, 512)."""
    from pigpen_spark.functions.text import _let

    n = len(cols)
    if n < 2:
        raise ValueError("hilbert_key_nd: need at least two columns")
    _, sb, _ = _hilbert_nd_machine(n)
    if n * bits + sb > 63:
        raise ValueError(
            f"hilbert_key_nd: {n} dims x {bits} bits + {sb} state bits "
            "exceeds a signed long")
    k = 1
    while k < bits and _lut_entries(n, k + 1) <= 1024:
        k += 1
    vs = [_c(c).cast("long") for c in cols]
    smask = F.lit((1 << sb) - 1)
    w: Column = F.lit(0).cast("long")

    def step(i: int, kk: int, lut_lit: Column):
        mask = (1 << kk) - 1

        def outer(ww: Column) -> Column:
            idx = F.shiftleft(ww.bitwiseAND(smask), n * kk)
            for j, v in enumerate(vs):
                bj = F.shiftright(v, i).bitwiseAND(F.lit(mask))
                idx = idx.bitwiseOR(F.shiftleft(bj, (n - 1 - j) * kk))
            code = F.element_at(lut_lit, (idx + F.lit(1)).cast("int"))

            def inner(cd: Column) -> Column:
                return (F.shiftleft(F.shiftright(ww, sb), n * kk + sb)
                        .bitwiseOR(cd))

            return _let(code.cast("long"), inner)

        return outer

    super_lut, _ = _hilbert_nd_super_lut(n, k)
    super_lit = F.lit(super_lut)
    # remainder levels must use the k=1 SUPER table, not the raw machine
    # LUT: step() packs dim j at bit (n-1-j) (dim 0 MSB — the super-LUT
    # convention) while the raw machine table expects dim j at bit j.
    # Mixing them produced wrong keys for N=3 at odd bits (the catalog
    # rows use even bits, so the oracle never saw it; caught by the
    # exhaustive N=3/bits=3 Arrow-equivalence test).
    rem_lut, _ = _hilbert_nd_super_lut(n, 1)
    rem_lit = F.lit(rem_lut)
    i = bits
    while i >= k:
        i -= k
        w = _let(w, step(i, k, super_lit))
    while i > 0:
        i -= 1
        w = _let(w, step(i, 1, rem_lit))
    return F.shiftright(w, sb)


def _lut_entries(n: int, k: int) -> int:
    _, _, n_states = _hilbert_nd_machine(n)
    return n_states << (n * k)


def hilbert_nd_cte_sql(source_sql: str, keep_cols: Sequence[str],
                       dim_sqls: Sequence[str], out_col: str = "hkey",
                       bits: int = 16) -> str:
    """DuckDB oracle for :func:`hilbert_key_nd`: the same flat LUT
    walked one chained CTE per bit level (never nested lambdas — the
    binder-superlinearity lesson), single-element list comprehension
    binding the code word once per stage."""
    n = len(dim_sqls)
    lut, sb, _ = _hilbert_nd_machine(n)
    code = "[" + ", ".join(str(c) for c in lut) + "]"
    smask = (1 << sb) - 1
    keep = ", ".join(keep_cols)
    dims = ", ".join(f"({d})::BIGINT AS h{j}" for j, d in enumerate(dim_sqls))
    dcols = ", ".join(f"h{j}" for j in range(n))
    parts = [
        f"hsrc AS (SELECT {keep}, {dims} FROM {source_sql})",
        f"w0 AS (SELECT {keep}, {dcols}, 0::BIGINT AS w FROM hsrc)",
    ]
    for st, i in enumerate(range(bits - 1, -1, -1), start=1):
        l = " | ".join(f"(((h{j} >> {i}) & 1) << {j})" for j in range(n))
        idx = f"(((w & {smask}) << {n}) | ({l}))"
        parts.append(
            f"w{st} AS (SELECT {keep}, {dcols}, "
            f"[(((w >> {sb}) << {n + sb}) | cd)::BIGINT "
            f"for cd in [{code}[{idx} + 1]]][1] AS w FROM w{st - 1})")
    return ("WITH " + ",\n    ".join(parts)
            + f"\n    SELECT {keep}, (w >> {sb})::BIGINT AS {out_col} "
              f"FROM w{bits}")


def cluster_by_zorder(df: DataFrame, cols: Sequence, bits: int = 16,
                      num_partitions: int | None = None) -> DataFrame:
    """Physically cluster ``df`` on the Z-curve: range-partition + sort
    within partitions by the Morton key, then drop it.

    The write-side half of Z-ordering: follow with ``store_parquet`` and
    every interleaved column's min/max file statistics become selective.
    ``repartitionByRange`` samples the key distribution, so skewed
    composites still split evenly; the intra-partition sort is the
    standard spillable Spark sort."""
    key = zorder_key(cols, bits).alias("__pp_zkey")
    out = df.withColumn("__pp_zkey", key)
    if num_partitions is not None:
        out = out.repartitionByRange(num_partitions, "__pp_zkey")
    else:
        out = out.repartitionByRange("__pp_zkey")
    return out.sortWithinPartitions("__pp_zkey").drop("__pp_zkey")


def compact_files(spark, path_in: str, path_out: str,
                  target_records_per_file: int, fmt: str = "parquet",
                  order_by: Sequence | None = None) -> int:
    """Small-file compaction: rewrite a directory of too-many-small
    files into ⌈n / target⌉ right-sized ones — the maintenance job every
    streaming/append sink eventually needs (a 100 TB lake of 1 MB part
    files pays per-file open/footer cost on every scan and floods the
    driver's file index).

    One count + one shuffle: ``repartition(n_files)`` for plain packing,
    or ``repartitionByRange(order_by)`` to simultaneously re-cluster (the
    poor man's OPTIMIZE ... ZORDER — compose with
    :func:`cluster_by_zorder` keys for the multi-column form).
    ``maxRecordsPerFile`` caps stragglers.  Returns the file count."""
    reader = getattr(spark.read, fmt)
    df = reader(path_in)
    n = df.count()
    n_files = max(1, -(-n // target_records_per_file))
    if order_by is not None:
        keys = [_c(c) for c in order_by]
        # sortWithinPartitions matters: without it a partition that the
        # maxRecordsPerFile cap splits would emit interleaved key ranges,
        # defeating the min/max file statistics this mode exists for
        df = df.repartitionByRange(n_files, *keys).sortWithinPartitions(*keys)
    else:
        df = df.repartition(n_files)
    (df.write.mode("overwrite")
       .option("maxRecordsPerFile", target_records_per_file)
       .format(fmt).save(path_out))
    return n_files

"""Property-based oracle fuzzing (SURVEY.md §5 pre-gate, strengthened):
hypothesis generates random predicate/aggregation SQL, and the SAME text
runs on Spark (over the registered temp views) and DuckDB (over the same
parquet). Any divergence in the shared ANSI subset — comparison semantics,
null handling, BETWEEN bounds, date truncation — surfaces here long before
a hand-written query would stumble on it.

Deterministic: hypothesis derandomized per test, so CI and the driver see
the same examples.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatainfinance1_spark.sources.catalog import register_views
from tests.conftest import SF_DIR

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_OPS = ["<", "<=", ">", ">=", "=", "<>"]

_num_pred = st.builds(
    lambda col, op, frac: (col, op, frac),
    st.sampled_from(_NUM_COLS),
    st.sampled_from(_OPS),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False, allow_infinity=False),
)

# constants chosen inside each column's real domain so predicates are selective
_DOMAIN = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}


def _render(pred) -> str:
    col, op, frac = pred
    lo, hi = _DOMAIN[col]
    const = lo + frac * (hi - lo)
    return f"{col} {op} {const!r}"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF_DIR)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p1=_num_pred, p2=_num_pred, conj=st.sampled_from(["AND", "OR"]))
def test_fuzz_filter_counts_match(spark, duck, p1, p2, conj):
    """Random two-term numeric predicates: COUNT(*) must agree exactly."""
    sql = (
        "SELECT count(*) AS n FROM lineitem "
        f"WHERE ({_render(p1)}) {conj} ({_render(p2)})"
    )
    n_spark = spark.sql(sql).collect()[0][0]
    n_duck = duck.execute(sql).fetchone()[0]
    assert n_spark == n_duck, sql


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p=_num_pred, key=st.sampled_from(["l_returnflag", "l_linestatus", "l_shipmode"]))
def test_fuzz_grouped_aggregates_match(spark, duck, p, key):
    """Random filter + group-by: per-group count and integer-exact sum of
    l_quantity (values are small integers — double-exact in any order)."""
    sql = (
        f"SELECT {key} AS k, count(*) AS n, round(sum(l_quantity), 2) AS sq "
        f"FROM lineitem WHERE {_render(p)} GROUP BY {key}"
    )
    s = {(r[0], r[1], r[2]) for r in spark.sql(sql).collect()}
    d = {(r[0], r[1], r[2]) for r in duck.execute(sql).fetchall()}
    assert s == d, sql


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frac=st.floats(min_value=0.1, max_value=0.9, allow_nan=False))
def test_fuzz_ignore_nulls_ffill_matches(spark, duck, frac):
    """Random null pattern (daily revenue nulled below a random threshold),
    then forward-fill via last_value IGNORE NULLS over the same frame.
    The IGNORE NULLS placement differs by dialect (Spark: after the call;
    DuckDB: inside the parens), so each engine renders its own text — the
    property is that the filled series agree exactly."""
    thresh = 100000.0 + frac * 4000000.0
    inner = (
        "SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day, "
        f"CASE WHEN sum(o_totalprice) > {thresh!r} THEN round(sum(o_totalprice), 2) END AS v "
        "FROM orders GROUP BY o_orderpriority, date_trunc('day', o_orderdate)"
    )
    frame = (
        "OVER (PARTITION BY o_orderpriority ORDER BY day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    # CAST day on both sides: DuckDB's raw fetchall yields datetime.date for
    # date_trunc here while Spark yields datetime.datetime (the pandas-based
    # oracle gate normalizes this; raw tuple compare doesn't)
    spark_sql = (
        "SELECT o_orderpriority, CAST(day AS TIMESTAMP) AS day, "
        f"last_value(v) IGNORE NULLS {frame} AS f FROM ({inner})"
    )
    duck_sql = (
        "SELECT o_orderpriority, CAST(day AS TIMESTAMP) AS day, "
        f"last_value(v IGNORE NULLS) {frame} AS f FROM ({inner})"
    )
    s = {tuple(r) for r in spark.sql(spark_sql).collect()}
    d = {tuple(r) for r in duck.execute(duck_sql).fetchall()}
    assert s == d, spark_sql


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(mult=st.floats(min_value=0.90, max_value=1.06, allow_nan=False))
def test_fuzz_correlated_subquery_counts_match(spark, duck, mult):
    """Correlated scalar subquery with a random threshold multiplier: the
    SAME text runs on both engines; membership counts must agree (the random
    multiplier lands measurably far from any price/avg boundary)."""
    sql = (
        "SELECT count(*) AS n FROM part p "
        f"WHERE p_retailprice > {mult!r} * "
        "(SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)"
    )
    n_spark = spark.sql(sql).collect()[0][0]
    n_duck = duck.execute(sql).fetchone()[0]
    assert n_spark == n_duck, sql


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    buckets=st.integers(min_value=1, max_value=7),
)
def test_fuzz_global_rank_recomposition(spark, n, seed, buckets):
    """Property: the range-bucketed two-phase row number and prefix sum
    (functions/ranks.py) must equal the single-partition reference for any
    data and any bucket count — including keys with heavy duplication (the
    tiebreak id makes the order total) and n < buckets."""
    import random

    from pyspark.sql import functions as F

    from bigdatainfinance1_spark.functions.ranks import (
        global_row_number,
        global_running_sum,
    )

    rng = random.Random(seed)
    rows = [(i, rng.randint(-50, 50), rng.randint(0, 1000)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, key long, val long")

    ranked = global_row_number(df, ["key", "id"], rn_col="rn", n_buckets=buckets)
    got = [
        (r["id"], r["rn"])
        for r in ranked.orderBy("key", "id").collect()
    ]
    expected_order = sorted(rows, key=lambda r: (r[1], r[0]))
    assert got == [(r[0], i + 1) for i, r in enumerate(expected_order)]

    summed = global_running_sum(df, ["key", "id"], "val", "run", n_buckets=buckets)
    got_sum = {r["id"]: r["run"] for r in summed.collect()}
    acc = 0
    for r in expected_order:
        acc += r[2]
        assert got_sum[r[0]] == acc


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    buckets=st.integers(min_value=1, max_value=7),
)
def test_fuzz_grouped_running_sum_recomposition(spark, n, seed, buckets):
    """Property: the range-bucketed GROUPED prefix sum (the q_weighted_median
    scale fix — no Window.partitionBy on a low-cardinality group key) must
    equal the per-group sequential reference for any data, any bucket count,
    and any group cardinality (1 group = the degenerate global case; groups
    with heavy key duplication exercise the boundary-bucket split)."""
    import random

    from bigdatainfinance1_spark.functions.ranks import grouped_running_sum

    rng = random.Random(seed)
    rows = [
        (i, rng.randint(0, 3), rng.randint(-50, 50), rng.randint(0, 1000))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, grp long, key long, val long")

    summed = grouped_running_sum(
        df, ["grp"], ["key", "id"], "val", "run", n_buckets=buckets
    )
    got = {r["id"]: r["run"] for r in summed.collect()}
    assert len(got) == n
    acc: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        acc[r[1]] = acc.get(r[1], 0) + r[3]
        assert got[r[0]] == acc[r[1]]


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    buckets=st.integers(min_value=1, max_value=7),
)
def test_fuzz_grouped_lag_and_running_max(spark, n, seed, buckets):
    """Property: the boundary-stitched grouped lag and the prefix-combined
    grouped running max (the q_interarrival_burstiness /
    q_watermark_design scale fixes) must equal the per-group sequential
    reference — including NULL for each group's first row (lag, and the
    exclusive-frame running max)."""
    import random

    from bigdatainfinance1_spark.functions.ranks import (
        grouped_lag,
        grouped_running_max,
    )

    rng = random.Random(seed)
    rows = [
        (i, rng.randint(0, 3), rng.randint(-50, 50), rng.randint(0, 1000))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, grp long, key long, val long")

    lagged = grouped_lag(df, ["grp"], ["key", "id"], "val", "prev", n_buckets=buckets)
    got_lag = {r["id"]: r["prev"] for r in lagged.collect()}
    rmax = grouped_running_max(
        df, ["grp"], ["key", "id"], "val", "mx", n_buckets=buckets, inclusive=False
    )
    got_max = {r["id"]: r["mx"] for r in rmax.collect()}
    assert len(got_lag) == n and len(got_max) == n
    last: dict[int, int] = {}
    hi: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        assert got_lag[r[0]] == last.get(r[1])
        assert got_max[r[0]] == hi.get(r[1])
        last[r[1]] = r[3]
        hi[r[1]] = max(hi.get(r[1], r[3]), r[3])


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    buckets=st.integers(min_value=1, max_value=7),
)
def test_fuzz_grouped_lag_null_values(spark, n, seed, buckets):
    """Property (round-8 verdict task 7): grouped_lag must equal LAG even
    when the lagged VALUE column contains NULLs mid-group. The naive
    boundary stitch `coalesce(_local_lag, _boundary)` fails this — it reads
    a NULL lagged VALUE as "bucket-first row" and substitutes the previous
    bucket's last value; the row_number-guarded form must not. NULLs are
    placed adversarially often (~1/3 of rows) so bucket boundaries land on
    them across the fuzzed bucket counts."""
    import random

    from bigdatainfinance1_spark.functions.ranks import grouped_lag

    rng = random.Random(seed)
    rows = [
        (
            i,
            rng.randint(0, 3),
            rng.randint(-50, 50),
            None if rng.random() < 1 / 3 else rng.randint(0, 1000),
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, grp long, key long, val long")
    lagged = grouped_lag(df, ["grp"], ["key", "id"], "val", "prev", n_buckets=buckets)
    got = {r["id"]: r["prev"] for r in lagged.collect()}
    assert len(got) == n
    last: dict[int, int | None] = {}
    seen: set[int] = set()
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        assert got[r[0]] == (last.get(r[1]) if r[1] in seen else None)
        last[r[1]] = r[3]
        seen.add(r[1])


# ---------------------------------------------------------------------------
# FIFO allocation property test: the interval-algebra formulation
# (q_fifo_allocation) must agree with a reference imperative FIFO matcher on
# random lot books. Hypothesis drives both; the Spark/DuckDB engines are not
# involved — this pins the MATH of the interval form, while test_oracle pins
# the engines against each other.
# ---------------------------------------------------------------------------


def _fifo_reference(sales, returns):
    """Textbook FIFO matcher: consume sale lots in order for each return."""
    lots = [[q, i] for i, q in enumerate(sales)]  # [remaining, lot id]
    pairs = []
    li = 0
    for r_id, rq in enumerate(returns):
        while rq > 0 and li < len(lots):
            take = min(rq, lots[li][0])
            if take > 0:
                pairs.append((lots[li][1], r_id, take))
                lots[li][0] -= take
                rq -= take
            if lots[li][0] == 0:
                li += 1
        # rq > 0 with no lots left = unmatched (oversold) remainder
    return pairs


def _fifo_intervals(sales, returns):
    """The q_fifo_allocation formulation: cumulative intervals, pairs =
    intersections."""
    pairs = []
    cs = 0
    s_iv = []
    for i, q in enumerate(sales):
        s_iv.append((cs, cs + q, i))
        cs += q
    cr = 0
    for r_id, q in enumerate(returns):
        lo, hi = cr, cr + q
        cr += q
        for s_lo, s_hi, s_id in s_iv:
            m = min(s_hi, hi) - max(s_lo, lo)
            if m > 0:
                pairs.append((s_id, r_id, m))
    return pairs


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    sales=st.lists(st.integers(min_value=1, max_value=40), min_size=0, max_size=12),
    returns=st.lists(st.integers(min_value=1, max_value=40), min_size=0, max_size=12),
)
def test_fifo_interval_form_equals_reference_matcher(sales, returns):
    assert sorted(_fifo_intervals(sales, returns)) == sorted(
        _fifo_reference(sales, returns)
    )


# ---------------------------------------------------------------------------
# AUC integer-numerator property: q_auc_by_month's per-score formulation
# (2·np·cumneg + np·nn over distinct scores) must equal direct pair counting
# with half credit for ties, on random labeled samples.
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
def test_auc_per_score_formula_equals_pair_counting(data):
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    if not pos or not neg:
        return
    # direct pair counting
    num_direct = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    # per-score integer formulation
    from collections import Counter

    cp, cn = Counter(pos), Counter(neg)
    scores = sorted(set(cp) | set(cn))
    cum_nn, num2 = 0, 0
    for s in scores:
        np_, nn_ = cp.get(s, 0), cn.get(s, 0)
        num2 += 2 * np_ * cum_nn + np_ * nn_
        cum_nn += nn_
    assert num2 == int(round(2 * num_direct))


# ---------------------------------------------------------------------------
# Rolling-distinct explode form: q_rolling_distinct_users' explode-to-cover
# equi-join must equal the brute-force trailing-window distinct count.
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=8)),
        min_size=1,
        max_size=80,
    )
)
def test_rolling_distinct_explode_form_equals_bruteforce(events):
    days = sorted({d for d, _ in events})
    brute = {
        d: len({u for (dd, u) in events if d - 6 <= dd <= d}) for d in days
    }
    # explode form: distinct (day, user) -> cover days d..d+6 -> count distinct per observed day
    from collections import defaultdict

    cover = defaultdict(set)
    for dd, u in set(events):
        for c in range(dd, dd + 7):
            cover[c].add(u)
    explode = {d: len(cover[d]) for d in days}
    assert explode == brute


# ---------------------------------------------------------------------------
# BPE properties: (1) the q_bpe_train merge fold (DuckDB list_reduce form,
# identical shape to the Spark aggregate() expression) must equal a pure-
# Python reference single-pass merge on random symbol sequences — including
# the overlap case 'a a a' -> ['aa', 'a']; (2) the full distributed trainer
# must reproduce a reference Sennrich trainer (greedy max pair, lexicographic
# tie-break) on an adversarial vocabulary.
# ---------------------------------------------------------------------------


def _bpe_merge_reference(syms, x, y):
    out = []
    for s in syms:
        if out and out[-1] == x and s == y:
            out[-1] = x + y
        else:
            out.append(s)
    return out


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba"]), min_size=1, max_size=10),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba"]), st.sampled_from(["a", "b", "ab", "ba"])
    ),
)
def test_bpe_fold_equals_reference_merge(syms, pair):
    import duckdb

    x, y = pair
    got = duckdb.execute(
        """
        SELECT list_reduce(list_transform($1::VARCHAR[], c -> [c]),
                 (acc, el) -> CASE WHEN acc[-1] = $2 AND el[1] = $3
                                   THEN list_append(list_slice(acc, 1, len(acc) - 1),
                                                    $2 || $3)
                                   ELSE list_concat(acc, el) END)
        """,
        [syms, x, y],
    ).fetchone()[0]
    assert got == _bpe_merge_reference(syms, x, y)


def _bpe_train_reference(word_counts, iters):
    """Pure-Python Sennrich trainer: greedy max-frequency pair, ties broken
    lexicographically on (x, y); returns [(x, y, pair_count, total_symbols)]."""
    words = [(list(w), c) for w, c in word_counts.items()]
    out = []
    for _ in range(iters):
        counts = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + c
        (x, y), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        words = [(_bpe_merge_reference(syms, x, y), c) for syms, c in words]
        total = sum(len(syms) * c for syms, c in words)
        out.append((x, y, pc, total))
    return out


def test_bpe_trainer_matches_reference_on_adversarial_vocab(spark):
    from pyspark.sql import functions as F

    from bigdatainfinance1_spark.operators.text import _bpe_train_words

    vocab = {"aaaa": 5, "aaab": 3, "abab": 4, "a": 7, "baaa": 2, "bbbb": 1}
    words = spark.createDataFrame(
        [(list(w), c) for w, c in vocab.items()], "syms array<string>, cnt long"
    )
    got = [
        (r["x"], r["y"], r["pair_count"], r["total_symbols"])
        for r in _bpe_train_words(words, 4).orderBy("merge_rank").collect()
    ]
    assert got == _bpe_train_reference(vocab, 4)


# ---------------------------------------------------------------------------
# UniMax water-filling property: the closed-form prefix rule implemented in
# q_unimax_mixture (a language is capped iff its capacity fits under the
# running fair share, everyone else splits the slack evenly) must equal the
# sequential greedy reference on random capacity vectors.
# ---------------------------------------------------------------------------


def _waterfill_closed_form(caps: list[float], budget: float) -> list[float]:
    """The q_unimax_mixture rule: sort ascending, capped PREFIX (the first
    failure ends it — max-min fairness caps a prefix of the ascending
    order, never a later item; an earlier per-row formulation without the
    prefix cut-off mis-capped [1,1] at budget 1 and was caught by this
    very test), then the common level t splits the slack."""
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    L = len(caps)
    cum = 0.0
    capped = []
    for rn, i in enumerate(order, start=1):
        if caps[i] <= (budget - cum) / (L - rn + 1):
            capped.append(i)
            cum += caps[i]
        else:
            break
    uncapped = [i for i in order if i not in capped]
    t = (budget - cum) / len(uncapped) if uncapped else None
    return [caps[i] if i in capped else t for i in range(len(caps))]


def _waterfill_reference(caps: list[float], budget: float) -> list[float]:
    """Sequential greedy: ascending capacities, each takes min(cap, fair
    share of what remains) — the textbook max-min fair allocation."""
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    alloc = [0.0] * len(caps)
    remaining = budget
    left = len(caps)
    for i in order:
        share = remaining / left
        alloc[i] = min(caps[i], share)
        remaining -= alloc[i]
        left -= 1
    return alloc


@settings(max_examples=100, deadline=None, derandomize=True)
@given(
    caps=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=10),
    budget_pct=st.integers(min_value=1, max_value=99),
)
def test_waterfill_closed_form_equals_greedy(caps, budget_pct):
    budget = sum(caps) * budget_pct / 100.0
    a = _waterfill_closed_form([float(c) for c in caps], budget)
    b = _waterfill_reference([float(c) for c in caps], budget)
    assert all(abs(x - y) < 1e-9 * max(1.0, budget) for x, y in zip(a, b))
    assert abs(sum(a) - budget) < 1e-9 * max(1.0, budget)


def test_lloyd_assign_strategies_bitwise_equal(spark, monkeypatch):
    """iterative._assign's two physical strategies (plan-literal fold for
    small k, broadcast-join + min(struct) for q_semdedup's corpus-derived
    k) must produce IDENTICAL (cid, d2) for every vector — same 12-dp
    rounded distances, same lowest-cid tiebreak — or the semdedup oracle
    would silently diverge right at the k crossover."""
    from bigdatainfinance1_spark.operators import iterative
    from bigdatainfinance1_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = [
        [float(v) for v in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(20).collect()
    ]
    join_rows = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in iterative._assign(emb, cents).select("vec_id", "cid", "d2").collect()
    }
    monkeypatch.setattr(iterative, "ASSIGN_LITERAL_MAX_K", 64)
    lit_rows = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in iterative._assign(emb, cents).select("vec_id", "cid", "d2").collect()
    }
    assert join_rows == lit_rows


def test_lloyd_assign_budget_gate_trips_to_ivf(spark, monkeypatch):
    """Round-5 verdict task 2: above ASSIGN_EXACT_BUDGET, _assign must
    auto-switch to the IVF-bucketed probe (warning emitted), and the
    approximate assignment must still be a TOTAL function — every vector
    assigned exactly once to an in-range centroid with a 12-dp distance."""
    import warnings

    from bigdatainfinance1_spark.operators import iterative
    from bigdatainfinance1_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    cents = [
        [float(v) for v in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(20).collect()
    ]
    monkeypatch.setattr(iterative, "ASSIGN_EXACT_BUDGET", 1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = iterative._assign(emb, cents, n_rows=n).collect()
    assert any("IVF-bucketed probe" in str(w.message) for w in caught)
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert all(0 <= r["cid"] < len(cents) and r["d2"] >= 0.0 for r in rows)


def test_assign_ivf_full_probe_equals_exact(spark):
    """With nprobe >= the number of occupied coarse cells, the IVF probe
    considers every fine centroid, so it must reproduce the exact
    assignment — same cid for every vector (lowest-cid tiebreak), d2 equal
    up to the exact path's 12-dp rounding (the IVF path skips that
    re-round: it exists for cross-engine oracle agreement, and no oracle
    sees the gated path) — the recall knob degrades gracefully to
    exactness."""
    from bigdatainfinance1_spark.operators import iterative
    from bigdatainfinance1_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = [
        [float(v) for v in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(20).collect()
    ]
    exact = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in iterative._assign(emb, cents).select("vec_id", "cid", "d2").collect()
    }
    approx = {
        r["vec_id"]: (r["cid"], r["d2"])
        for r in iterative._assign_ivf(emb, cents, nprobe=len(cents))
        .select("vec_id", "cid", "d2")
        .collect()
    }
    assert set(exact) == set(approx)
    for vid, (cid, d2) in exact.items():
        a_cid, a_d2 = approx[vid]
        assert cid == a_cid, f"vec {vid}: exact cid {cid} != ivf cid {a_cid}"
        assert abs(d2 - a_d2) <= 1e-9, f"vec {vid}: d2 {d2} vs {a_d2}"


def test_assign_budget_gate_cannot_trip_at_oracle_tiers():
    """The driver compares at sf0.01 (500 embeddings) and the bench runs
    sf0.1 (2000): with k = max(8, ceil(n/250)), n*k stays orders of
    magnitude under ASSIGN_EXACT_BUDGET at every oracle tier, so the
    value-hash oracles always verify the EXACT Lloyd semantics."""
    from bigdatainfinance1_spark.operators import iterative
    from bigdatainfinance1_spark.operators.similarity import SEMDEDUP_TARGET_CLUSTER

    for n in (500, 2000):
        k = max(8, -(-n // SEMDEDUP_TARGET_CLUSTER))
        assert n * k <= iterative.ASSIGN_EXACT_BUDGET


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    sets=st.lists(
        st.frozensets(st.integers(min_value=0, max_value=40), min_size=1, max_size=15),
        min_size=2,
        max_size=12,
    ),
    t_pct=st.integers(min_value=50, max_value=95),
)
def test_prefix_filter_is_lossless(sets, t_pct):
    """The PPJoin prefix bound used by q_prefix_filter_join: if
    J(x, y) >= t then the rarest-first prefixes of length
    |d| - ceil(t*|d|) + 1 must intersect. Checked against brute force on
    random small set families — a miss here would mean the Spark operator
    silently drops true pairs (the oracle would also catch it, but only
    on the fixed corpus; this covers the adversarial space)."""
    import math
    from collections import Counter

    t = t_pct / 100.0
    df = Counter(tok for s in sets for tok in s)
    # rarest-first global order, ties by token id (same as the operator)
    order = {tok: (df[tok], tok) for s in sets for tok in s}
    prefixes = []
    for s in sets:
        ranked = sorted(s, key=lambda tok: order[tok])
        p = len(s) - math.ceil(t * len(s)) + 1
        prefixes.append(set(ranked[:p]))
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter / union >= t:
                assert prefixes[i] & prefixes[j], (
                    f"true pair ({i},{j}) J={inter/union:.3f} missed by prefix filter"
                )


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    mantissa=st.integers(min_value=-(10**15), max_value=10**15),
    exp=st.integers(min_value=-18, max_value=3),
    nd=st.integers(min_value=0, max_value=12),
)
def test_rnd_half_away_matches_decimal_ground_truth(mantissa, exp, nd):
    """rnd_half_away must agree with exact decimal HALF_UP rounding of the
    double's value wherever x*10^nd is exactly representable, and
    elsewhere stay within one ulp of it (the double-rounding boundary) —
    the property DuckDB's std::round(x*p)/p also satisfies. The bitwise
    DuckDB match is pinned in test_rounding.py; this covers the numeric
    envelope over a much larger random space."""
    import decimal
    import math

    from bigdatainfinance1_spark.functions.rounding import rnd_half_away

    x = float(mantissa) * (10.0 ** exp)
    if not math.isfinite(x):
        return
    ours = rnd_half_away(x, nd)
    ctx = decimal.Context(prec=60)  # enough digits for |x| up to 1e18 at 12 dp
    exact = float(
        decimal.Decimal(x).quantize(
            decimal.Decimal(1).scaleb(-nd), decimal.ROUND_HALF_UP, context=ctx
        )
    )
    if ours != exact:
        # double-rounding disagreement allowed only when x*10^nd is inexact,
        # and then by at most one ulp of the result
        v = abs(x) * (10.0 ** nd)
        # one output quantum, with an epsilon for the comparison's own
        # float arithmetic (|5e-10 - 4e-10| computes 2 ulps over 1e-10)
        assert v > 2**52 or abs(ours - exact) <= 10.0 ** (-nd) * 1.000001, (x, nd, ours, exact)


# ---------------------------------------------------------------------------
# Round-4 late-wave numeric properties
# ---------------------------------------------------------------------------


def _norm_cdf_py(x: float) -> float:
    """Python mirror of quant_pricing._norm_cdf_sql (A&S 26.2.17)."""
    import math

    t = 1.0 / (1.0 + 0.2316419 * abs(x))
    poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    upper = 1.0 - math.exp(-abs(x) * abs(x) / 2.0) / math.sqrt(2.0 * math.pi) * poly
    return upper if x >= 0.0 else 1.0 - upper


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    x=st.floats(min_value=-6.0, max_value=6.0, allow_nan=False, allow_infinity=False)
)
def test_norm_cdf_approximation_envelope(x):
    """The A&S polynomial q_black_scholes uses must stay within its
    published 7.5e-8 error bound of the true CDF and respect the
    symmetry N(x) + N(-x) = 1 it is assembled from."""
    import math

    true = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
    approx = _norm_cdf_py(x)
    assert abs(approx - true) < 7.5e-8
    # exact 1 - N(-x) symmetry holds off the branch point; AT x ~ 0 both
    # signs take the upper branch so the defect is 2x the polynomial error
    assert abs(_norm_cdf_py(x) + _norm_cdf_py(-x) - 1.0) < 1.6e-7


def test_black_scholes_put_call_parity_and_bounds(spark):
    """Every priced row must satisfy put-call parity to the 4-dp rounding
    (parity is how the put is built, so this guards future refactors) and
    the no-arbitrage lower bounds C >= max(0, S - K e^-rT)."""
    import math

    from bigdatainfinance1_spark.registry import load_all_queries

    rows = load_all_queries()["q_black_scholes"].fn(spark, SF_DIR).collect()
    assert rows
    disc = math.exp(-0.05 * 0.5)
    for r in rows:
        parity_gap = (r["call_price"] - r["put_price"]) - (r["spot"] - r["strike"] * disc)
        assert abs(parity_gap) < 2e-4, r
        assert r["call_price"] >= max(0.0, r["spot"] - r["strike"] * disc) - 1e-4, r
        assert r["put_price"] >= -1e-4, r


def test_irr_bisection_roots_bracketed_and_npv_small(spark):
    """The reported IRR must actually zero the NPV: |NPV(irr)| below the
    first-order bound (max cashflow x 8 x bracket width) — catches a
    wrong-sign branch or an off-by-one in the unrolled terms."""
    from bigdatainfinance1_spark.registry import load_all_queries

    rows = load_all_queries()["q_irr_bisection"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        nk, irr = r["nationkey"], r["irr"]
        npv = -1000.0 + sum(
            (150.0 + 25.0 * ((nk + t) % 5)) / (1.0 + irr) ** t for t in range(1, 9)
        )
        assert 0.0 < irr < 1.0, r
        assert abs(npv) < 1e-2, (r, npv)  # derivative ~1e4 x rounding step 1e-6


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    tokens=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=12,
        max_size=40,
    ),
    start=st.integers(min_value=0, max_value=20),
)
def test_winnowing_guarantee_shared_run_yields_shared_fingerprint(tokens, start):
    """The winnowing guarantee (Schleimer et al. theorem): two documents
    sharing a contiguous run of >= K+W-1 tokens share at least one selected
    fingerprint. Verified against a pure-Python mirror of the operator's
    selection rule (md5 k-gram keys, window min, rightmost tie)."""
    import hashlib

    K, W = 4, 4

    def select(toks):
        keys = []
        for i in range(0, len(toks) - K + 1):
            h = hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()
            keys.append(h + str(99999999 - i).zfill(8))
        sel = set()
        for i in range(W - 1, len(keys)):
            sel.add(min(keys[i - W + 1 : i + 1]))
        return {k[:32] for k in sel}

    run_len = K + W - 1
    if len(tokens) < run_len:
        return
    start = min(start, len(tokens) - run_len)
    shared_run = tokens[start : start + run_len]
    # doc B embeds the shared run inside unrelated padding
    doc_b = ["pad1", "pad2", "pad3"] + shared_run + ["pad4", "pad5", "pad6"]
    fa, fb = select(tokens), select(doc_b)
    assert fa & fb, (tokens, doc_b)


def test_ridge_path_shrinks_toward_zero(spark):
    """Coefficient magnitudes must be non-increasing in lambda (the
    defining property of the ridge path) and lambda=0 must reproduce the
    unregularized solve."""
    from bigdatainfinance1_spark.registry import load_all_queries

    rows = {
        r["lambda"]: r
        for r in load_all_queries()["q_ridge_path"].fn(spark, SF_DIR).collect()
    }
    lams = sorted(rows)
    for a, b in zip(lams, lams[1:]):
        assert abs(rows[b]["beta_trend"]) <= abs(rows[a]["beta_trend"]) + 1e-9
        assert abs(rows[b]["beta_priority"]) <= abs(rows[a]["beta_priority"]) + 1e-9


_DOC_PREDS = st.builds(
    lambda lang, thresh: (lang, thresh),
    st.sampled_from(["en", "de", "fr", "es", "ja"]),
    st.integers(min_value=0, max_value=900),
)


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p=_DOC_PREDS)
def test_fuzz_bitmap_index_identity(spark, p):
    """q_bitmap_index_and's machinery must hold for ARBITRARY predicate
    pairs, not just the registered one: popcount(bitmap_a AND bitmap_b)
    == the direct conjunctive scan count, for random (lang, n_chars)
    predicates. Guards the shift/sign-bit arithmetic (32-bit words keep
    bit 31 off the BIGINT sign position) against predicate drift."""
    from pyspark.sql import functions as F

    lang, thresh = p
    docs = spark.table("documents")
    base = docs.select(
        F.floor(F.col("doc_id") / 32).cast("long").alias("w"),
        (F.col("doc_id") % 32).cast("long").alias("b"),
        F.when(F.col("lang") == lang, 1).otherwise(0).alias("pa"),
        F.when(F.col("n_chars") > thresh, 1).otherwise(0).alias("pb"),
    )
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")
    words = base.groupBy("w").agg(
        F.bit_or(F.when(F.col("pa") == 1, mask).otherwise(F.lit(0).cast("long"))).alias("wa"),
        F.bit_or(F.when(F.col("pb") == 1, mask).otherwise(F.lit(0).cast("long"))).alias("wb"),
    )
    via_bitmap = words.agg(
        F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb")))).alias("c")
    ).collect()[0]["c"]
    direct = base.filter((F.col("pa") == 1) & (F.col("pb") == 1)).count()
    assert via_bitmap == direct


@given(
    n=st.integers(min_value=1, max_value=40),
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=39), st.integers(min_value=0, max_value=39)),
        max_size=120,
    ),
)
@settings(max_examples=200, deadline=None)
def test_min_union_find_equals_bfs_reference(n, edges):
    """q_grid_dbscan's driver-local union-find labels every node with the
    MINIMUM node id of its component — verified against a plain BFS
    reference on arbitrary graphs (self-loops, duplicates, out-of-range
    endpoints filtered the same way the cell join bounds them)."""
    from bigdatainfinance1_spark.operators.cluster_quality import min_label_components

    nodes = list(range(n))
    es = [(s, t) for s, t in edges if s < n and t < n]
    got = min_label_components(nodes, es)
    # BFS reference
    adj = {v: set() for v in nodes}
    for s, t in es:
        adj[s].add(t)
        adj[t].add(s)
    want, seen = {}, set()
    for v in nodes:
        if v in seen:
            continue
        comp, queue = [], [v]
        seen.add(v)
        while queue:
            u = queue.pop()
            comp.append(u)
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    queue.append(w)
        m = min(comp)
        for u in comp:
            want[u] = m
    assert got == want

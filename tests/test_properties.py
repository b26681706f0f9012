"""Property-based invariants (hypothesis) for the pure-numpy kernels and the
closed-form operators whose correctness rests on an algebraic argument.

Fast numpy-level properties run with hypothesis defaults; the one Spark-level
property (tail_trim's closed form vs the reference's literal iterative
algorithm) runs a bounded number of examples against one shared session.
"""

import numpy as np
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from mpnsm_spark.functions.tuning import _q6, dec_mean, make_ladder
from mpnsm_spark.operators.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)

# ------------------------------------------------------------------ Gorilla


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**48), min_size=1, max_size=300
    )
)
def test_gorilla_ts_roundtrip_any_sorted_input(deltas):
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) + 1_700_000_000
    out = decode_timestamps(encode_timestamps(ts), len(ts))
    assert out.dtype == np.int64 and np.array_equal(out, ts)


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1,
        max_size=300,
    )
)
def test_gorilla_values_roundtrip_bitwise_any_floats(vals):
    v = np.asarray(vals, dtype=np.float64)
    out = decode_values(encode_values(v), len(v))
    # BITWISE equality (NaN payloads and signed zeros included)
    assert np.array_equal(out.view(np.uint64), v.view(np.uint64))


# ------------------------------------------------------------------- ladders


@given(
    st.floats(min_value=0.001, max_value=1e6),
    st.floats(min_value=0.001, max_value=1e6),
    st.floats(min_value=1.1, max_value=10.0),
)
def test_multiplicative_ladder_laws(initial, final, step):
    ladder = make_ladder(initial, final, step, "multiplicative")
    assert ladder[0] == float(initial)
    assert len(ladder) == len(set(ladder))  # no duplicate rungs
    if final >= initial:
        assert all(b > a for a, b in zip(ladder, ladder[1:]))
        assert ladder[-1] >= final  # overshoot rung included
        assert all(v < final for v in ladder[:-1])
    else:
        assert all(b < a for a, b in zip(ladder, ladder[1:]))
        assert ladder[-1] <= final


@given(
    st.floats(min_value=-1e6, max_value=1e6),
    st.floats(min_value=-1e6, max_value=1e6),
    st.floats(min_value=0.001, max_value=1e5),
)
@example(0.1, 0.4, 0.1)  # np.arange float accumulation landed ON final (ADVICE r3)
def test_additive_ladder_laws(initial, final, step):
    import pytest as _pytest

    if abs(final - initial) / step > 10_000:
        with _pytest.raises(ValueError, match="rungs"):
            make_ladder(initial, final, step, "additive")
        return
    ladder = make_ladder(initial, final, step, "additive")
    if ladder:
        assert ladder[0] == float(initial)
        sgn = 1.0 if final >= initial else -1.0
        diffs = np.diff(ladder)
        assert np.allclose(diffs, sgn * step)
        # strictly before final (arange semantics)
        assert all(sgn * (final - v) > 0 for v in ladder)


# ---------------------------------------------------------- decimal kernels


@given(st.lists(st.floats(min_value=-1e9, max_value=1e9), min_size=1, max_size=200))
def test_q6_matches_decimal_halfup(vals):
    import decimal

    got = _q6(np.asarray(vals))
    for v, g in zip(vals, got):
        want = int(
            decimal.Decimal(repr(float(v))).scaleb(6).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )
        # _q6 quantizes the BINARY double (float(v)*1e6 then half-away) —
        # allow 1 ulp divergence from exact-decimal string rounding, which
        # only occurs when v*1e6 lands within float error of a .5 boundary
        assert abs(int(g) - want) <= 1


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6), min_size=1, max_size=100))
def test_dec_mean_is_mean_of_quantized(vals):
    v = np.asarray(vals)
    assert dec_mean(v) == (_q6(v).sum() / 1e6) / len(v)


# ----------------------------------------------- tail_trim closed form (Spark)


def _iterative_tail_trim(values, order, max_keep):
    """The reference's literal algorithm (utils.py:289-299): repeatedly drop
    the current max, then the current min, until <= max_keep remain; ties
    resolved by order position (last for max, first for min)."""
    rows = list(zip(values, order))
    drop_max = True
    while len(rows) > max_keep:
        if drop_max:
            target = max(rows, key=lambda r: (r[0], r[1]))
        else:
            target = min(rows, key=lambda r: (r[0], r[1]))
        rows.remove(target)
        drop_max = not drop_max
    return sorted(r[1] for r in rows)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=24
    ),
    st.integers(min_value=1, max_value=20),
)
def test_tail_trim_closed_form_equals_iterative(spark, vals, max_keep):
    from mpnsm_spark.operators.outliers import tail_trim

    rows = [("c", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, value double")
    got = sorted(
        r.turn_idx for r in tail_trim(df, max_keep=max_keep).collect()
    )
    want = _iterative_tail_trim(
        [float(v) for v in vals], list(range(len(vals))), max_keep
    )
    assert got == want, (vals, max_keep)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=24,
    ),
    st.randoms(use_true_random=False),
)
def test_dot_static_bitwise_equals_interpreted_dot(spark, vals, rnd):
    """_dot_static (unrolled codegen getItem fold) must reproduce _dot
    (interpreted higher-order aggregate) BITWISE for any width — the oracle
    rows' hash gate depends on the swap being value-invisible."""
    from mpnsm_spark.operators.similarity import _dot, _dot_static

    from pyspark.sql import functions as F

    dim = len(vals)
    other = [rnd.uniform(-1e6, 1e6) for _ in range(dim)]
    df = spark.createDataFrame(
        [(vals, other)], "a array<double>, b array<double>"
    )
    row = df.select(
        _dot(F.col("a"), F.col("b")).alias("interp"),
        _dot_static(F.col("a"), F.col("b"), dim).alias("unrolled"),
    ).collect()[0]
    import struct

    assert struct.pack("<d", row["interp"]) == struct.pack("<d", row["unrolled"]), (
        vals,
        other,
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet="ab cd\tef\n", min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from(["md5", "xxhash64"]),
)
def test_minhash_signatures_df_equals_expression_form(spark, texts, strategy):
    """The explode→min-aggregate signature plan must emit the SAME longs as
    the expression form (minhash_lsh_pairs switched to the former; the pair
    oracle depends on the swap being value-invisible). Docs whose shingle
    array is null drop from the frame form by design."""
    from pyspark.sql import functions as F

    from mpnsm_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures_df,
        word_ngrams,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["_id"]: r["sig"]
        for r in minhash_signatures_df(
            df, num_hashes=8, hash_strategy=strategy
        ).collect()
    }
    want = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id",
            minhash_signature(
                word_ngrams(F.col("text"), 3), 8, strategy
            ).alias("sig"),
        ).collect()
        if r["sig"] is not None
    }
    assert got == want, texts

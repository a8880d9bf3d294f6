"""asof_join semantics on planted frames: strict vs inclusive tie handling,
deterministic tiebreak among equal right timestamps, and null padding when
no earlier right row exists.  Timestamps are plain longs — the operator
only needs an orderable column."""

from __future__ import annotations

from data_engineering_etl_demo_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 5, "l_early"), (1, 20, "l_tie"), (1, 35, "l_late"), (2, 50, "l_nokey")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 10, 101), (1, 20, 102), (1, 20, 103), (1, 30, 104)],
        ["k", "t", "rid"],
    )
    return left, right


def _collect(df):
    return {
        r["tag"]: r["asof_rid"]
        for r in df.select("tag", "asof_rid").collect()
    }


def test_strict_excludes_same_tick(spark):
    left, right = _frames(spark)
    got = _collect(
        asof_join(
            left, right, key="k", left_ts="t", right_ts="t",
            payload_cols=["rid"], strict=True, tiebreak="rid",
        )
    )
    assert got == {
        "l_early": None,  # nothing before t=5
        "l_tie": 101,  # t=20 rows invisible under strict <
        "l_late": 104,
        "l_nokey": None,  # key 2 has no right rows
    }


def test_inclusive_takes_tiebreak_winner(spark):
    left, right = _frames(spark)
    got = _collect(
        asof_join(
            left, right, key="k", left_ts="t", right_ts="t",
            payload_cols=["rid"], strict=False, tiebreak="rid",
        )
    )
    # at t=20 both rid 102 and 103 qualify; greatest tiebreak wins
    assert got["l_tie"] == 103
    assert got["l_late"] == 104
    assert got["l_early"] is None


def test_left_rows_and_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        payload_cols=["rid"], strict=True,
    )
    assert out.count() == left.count()
    assert set(left.columns) < set(out.columns)


def test_asof_payload_is_row_consistent_with_null_fields(spark):
    """A NULL payload value in the matched right row must come through as
    NULL — not be backfilled from an older right row (per-column carry
    tears the row; the payload must travel as one struct)."""
    from data_engineering_etl_demo_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 5, 1.0, 2.0), (1, 7, None, 9.0)],
        "k long, rts long, a double, b double",
    )
    row = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        payload_cols=["a", "b"], strict=True,
    ).collect()[0]
    # the latest right row before ts=10 is (ts=7, a=NULL, b=9.0): both
    # fields must come from THAT row
    assert row["asof_a"] is None
    assert row["asof_b"] == 9.0


def test_asof_matches_naive_reference_on_random_frames(spark):
    """Property: asof_join == the O(|L|·|R|) naive definition (latest
    right row of the same key with rt < lt, or <= when inclusive;
    greatest-tiebreak among equal winning timestamps) on random frames,
    both strictness modes."""
    from hypothesis import given, settings, strategies as st

    rows = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # key
            st.integers(min_value=0, max_value=20),   # ts
            st.integers(min_value=0, max_value=99),   # payload/id
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=8, deadline=None)
    @given(left=rows, right=rows, strict=st.booleans())
    def check(left, right, strict):
        # unique left ids so rows are addressable
        left = [(k, t, i) for i, (k, t, _) in enumerate(left)]
        ldf = spark.createDataFrame(left, ["k", "t", "lid"])
        rdf = spark.createDataFrame(right, ["k", "rt", "payload"])
        out = {
            r["lid"]: r["asof_payload"]
            for r in asof_join(
                ldf, rdf, key="k", left_ts="t", right_ts="rt",
                payload_cols=["payload"], strict=strict, tiebreak="payload",
            ).collect()
        }
        for k, t, lid in left:
            cands = [
                (rt, p)
                for (rk, rt, p) in right
                if rk == k and (rt < t if strict else rt <= t)
            ]
            want = max(cands)[1] if cands else None
            assert out[lid] == want, (k, t, lid, strict, cands)

    check()

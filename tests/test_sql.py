"""SQL front-end tests: lexer/parser errors, predicate lowering, and
full statements checked against numpy oracles or fluent-layer results.

Statements lower onto query.py, so the heavy physical paths are already
covered by test_query.py; these tests pin the SQL surface itself —
grammar, push-down analysis, carry-side selection, projection."""

import numpy as np
import jax.numpy as jnp
import pytest

from partitionedhashjoin_tpu.data.table import make_table
from partitionedhashjoin_tpu.sql import (
    SqlError,
    execute_sql,
    explain_sql,
    parse_sql,
)


def _t(keys, pays):
    return make_table(
        np.asarray(keys, np.int32), np.asarray(pays, np.int32)
    )


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(2026)
    a_keys = rng.permutation(40).astype(np.int32)  # unique build keys
    a = _t(a_keys, a_keys * 10)
    b = _t(rng.integers(0, 50, 400), rng.integers(-100, 100, 400))
    return {"a": a, "b": b}


class TestParser:
    def test_roundtrip_shapes(self):
        s = parse_sql(
            "SELECT key, COUNT(*) FROM b JOIN a USING (key) "
            "WHERE b.payload % 2 = 0 GROUP BY key "
            "ORDER BY count DESC LIMIT 5"
        )
        assert s.from_table == "b" and len(s.joins) == 1
        assert s.joins[0].join_type == "inner"
        assert s.group_by and s.order_by == "count" and s.descending
        assert s.limit == 5

    def test_join_types_and_aliases(self):
        s = parse_sql(
            "SELECT * FROM orders o LEFT JOIN customers AS c USING (key)"
        )
        assert s.from_alias == "o"
        assert s.joins[0].alias == "c"
        assert s.joins[0].join_type == "left"

    @pytest.mark.parametrize("bad,msg", [
        ("SELECT", "expected"),
        ("SELECT * FROM", "table name"),
        ("SELECT * FROM b JOIN a USING (payload)", "join column 'key'"),
        ("SELECT * FROM b GROUP BY payload", "group column 'key'"),
        ("SELECT * FROM b LIMIT x", "integer"),
        ("SELECT * FROM b WHERE value > 1", "unknown column"),
        ("SELECT nope FROM b", "unknown column"),
        ("SELECT * FROM b extra junk", "trailing"),
        ("SELECT COUNT(payload) FROM b", "COUNT takes"),
    ])
    def test_errors(self, bad, msg):
        with pytest.raises(SqlError, match=msg):
            parse_sql(bad)


class TestRowQueries:
    def test_select_star(self, db):
        r = execute_sql("SELECT * FROM b", db)
        assert r.row_count == 400
        np.testing.assert_array_equal(
            r.columns["key"], np.asarray(db["b"].keys)
        )

    def test_where_expressions(self, db):
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        cases = [
            ("payload % 2 = 0", bp % 2 == 0),
            ("NOT payload < 0", ~(bp < 0)),
            ("key IN (1, 3, 5) OR payload >= 90",
             np.isin(bk, [1, 3, 5]) | (bp >= 90)),
            ("key NOT IN (1, 3, 5)", ~np.isin(bk, [1, 3, 5])),
            ("(key + payload) * 2 > 50", (bk + bp) * 2 > 50),
            ("payload // 10 = -3", bp // 10 == -3),
            ("-payload > 20 AND key <> 7", (-bp > 20) & (bk != 7)),
            ("payload BETWEEN -10 AND 10", (bp >= -10) & (bp <= 10)),
            # BETWEEN binds tighter than the conjunction AND
            ("key BETWEEN 5 AND 20 AND payload > 0",
             (bk >= 5) & (bk <= 20) & (bp > 0)),
            ("payload NOT BETWEEN -10 AND 10", ~((bp >= -10) & (bp <= 10))),
        ]
        for cond, want_mask in cases:
            r = execute_sql(f"SELECT key FROM b WHERE {cond}", db)
            want = np.sort(bk[want_mask])
            got = np.sort(r.columns["key"])
            np.testing.assert_array_equal(got, want, err_msg=cond)

    def test_order_by_limit(self, db):
        r = execute_sql(
            "SELECT * FROM b ORDER BY payload DESC LIMIT 3", db
        )
        bp = np.asarray(db["b"].payloads)
        np.testing.assert_array_equal(
            r.columns["payload"], np.sort(bp)[::-1][:3]
        )

    def test_count_star(self, db):
        bk = np.asarray(db["b"].keys)
        r = execute_sql("SELECT COUNT(*) FROM b WHERE key < 10", db)
        assert r.columns["count"][0] == int((bk < 10).sum())


class TestJoinQueries:
    def _oracle_join(self, db, probe_mask=None, build_mask=None):
        ak = np.asarray(db["a"].keys)
        ap = np.asarray(db["a"].payloads)
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        amask = np.ones(len(ak), bool) if build_mask is None else build_mask
        bmask = np.ones(len(bk), bool) if probe_mask is None else probe_mask
        akeys = {int(k): int(p) for k, p in zip(ak[amask], ap[amask])}
        rows = [
            (int(k), akeys[int(k)], int(p))
            for k, p in zip(bk[bmask], bp[bmask])
            if int(k) in akeys
        ]
        return rows  # (key, build payload, probe payload)

    def test_join_count(self, db):
        rows = self._oracle_join(db)
        r = execute_sql(
            "SELECT COUNT(*) FROM b JOIN a USING (key)", db
        )
        assert r.columns["count"][0] == len(rows)

    def test_join_star_rows(self, db):
        rows = self._oracle_join(db)
        r = execute_sql("SELECT * FROM b JOIN a USING (key)", db)
        assert r.row_count == len(rows)
        got = sorted(zip(
            r.columns["key"].tolist(),
            r.columns["payload_build"].tolist(),
            r.columns["payload_probe"].tolist(),
        ))
        assert got == sorted(rows)

    def test_join_pushdown_filters(self, db):
        bp = np.asarray(db["b"].payloads)
        ak = np.asarray(db["a"].keys)
        rows = self._oracle_join(
            db, probe_mask=bp % 2 == 0, build_mask=ak >= 10
        )
        r = execute_sql(
            "SELECT COUNT(*) FROM b JOIN a USING (key) "
            "WHERE b.payload % 2 = 0 AND a.key >= 10",
            db,
        )
        assert r.columns["count"][0] == len(rows)
        # and the same filters on the materializing form
        r2 = execute_sql(
            "SELECT * FROM b JOIN a USING (key) "
            "WHERE b.payload % 2 = 0 AND a.key >= 10",
            db,
        )
        assert r2.row_count == len(rows)

    def test_semi_anti_left_counts(self, db):
        ak = set(np.asarray(db["a"].keys).tolist())
        bk = np.asarray(db["b"].keys)
        hits = int(sum(1 for k in bk.tolist() if k in ak))
        for jt, want in (
            ("SEMI", hits), ("ANTI", len(bk) - hits), ("LEFT", len(bk)),
        ):
            r = execute_sql(
                f"SELECT COUNT(*) FROM b {jt} JOIN a USING (key)", db
            )
            assert r.columns["count"][0] == want, jt

    def test_where_requires_qualification_in_join(self, db):
        with pytest.raises(SqlError, match="qualify"):
            execute_sql(
                "SELECT COUNT(*) FROM b JOIN a USING (key) "
                "WHERE payload > 0", db,
            )

    def test_cross_table_conjunct_rejected(self, db):
        with pytest.raises(SqlError, match="single table"):
            execute_sql(
                "SELECT COUNT(*) FROM b JOIN a USING (key) "
                "WHERE a.payload > b.payload", db,
            )


class TestGroupQueries:
    def test_group_by_aggregates(self, db):
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        r = execute_sql(
            "SELECT key, COUNT(*), SUM(payload), MIN(payload), "
            "MAX(payload) FROM b GROUP BY key ORDER BY key ASC",
            db,
        )
        want_keys = np.unique(bk)
        np.testing.assert_array_equal(r.columns["key"], want_keys)
        for i, k in enumerate(want_keys):
            sel = bp[bk == k]
            assert r.columns["count"][i] == len(sel)
            assert r.columns["sum"][i] == sel.sum()
            assert r.columns["min"][i] == sel.min()
            assert r.columns["max"][i] == sel.max()

    def test_group_by_avg_distinct(self, db):
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        r = execute_sql(
            "SELECT key, AVG(payload), COUNT(DISTINCT payload) "
            "FROM b GROUP BY key ORDER BY key",
            db,
        )
        for i, k in enumerate(np.unique(bk)):
            sel = bp[bk == k]
            assert r.columns["distinct"][i] == len(set(sel.tolist()))
            np.testing.assert_allclose(
                r.columns["avg"][i], sel.mean(), rtol=1e-6
            )

    def test_join_group_order_limit(self, db):
        # the composed pipeline (R3+R4) from SQL, vs a numpy oracle
        ak = np.asarray(db["a"].keys)
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        in_a = np.isin(bk, ak)
        kk, pp = bk[in_a], bp[in_a]
        counts = {int(k): int((kk == k).sum()) for k in np.unique(kk)}
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:5]
        r = execute_sql(
            "SELECT key, COUNT(*) FROM b JOIN a USING (key) "
            "GROUP BY key ORDER BY count DESC LIMIT 5",
            db,
        )
        got_counts = r.columns["count"].tolist()
        assert got_counts == [c for _, c in top]

    def test_carry_side_selection(self, db):
        # SUM over the BUILD payload requires carry='build'
        ak = np.asarray(db["a"].keys)
        ap = np.asarray(db["a"].payloads)
        bk = np.asarray(db["b"].keys)
        amap = {int(k): int(p) for k, p in zip(ak, ap)}
        in_a = np.isin(bk, ak)
        want = {}
        for k in bk[in_a].tolist():
            want[k] = want.get(k, 0) + amap[k]
        r = execute_sql(
            "SELECT key, SUM(a.payload) FROM b JOIN a USING (key) "
            "GROUP BY key ORDER BY key",
            db,
        )
        got = dict(zip(
            r.columns["key"].tolist(), r.columns["sum"].tolist()
        ))
        assert got == want

    def test_column_alongside_aggregate_needs_group_by(self, db):
        with pytest.raises(SqlError, match="GROUP BY"):
            execute_sql("SELECT key, SUM(payload) FROM b", db)


class TestScalarAggregates:
    def test_global_aggregates(self, db):
        bp = np.asarray(db["b"].payloads)
        r = execute_sql(
            "SELECT COUNT(*), SUM(payload), MIN(payload), MAX(payload), "
            "AVG(payload), COUNT(DISTINCT payload) FROM b", db,
        )
        assert r.row_count == 1
        assert r.columns["count"][0] == len(bp)
        assert r.columns["sum"][0] == np.int32(bp.sum())
        assert r.columns["min"][0] == bp.min()
        assert r.columns["max"][0] == bp.max()
        np.testing.assert_allclose(r.columns["avg"][0], bp.mean(), rtol=1e-6)
        assert r.columns["distinct"][0] == len(set(bp.tolist()))

    def test_global_aggregates_filtered(self, db):
        bp = np.asarray(db["b"].payloads)
        sel = bp[bp % 3 == 0]
        r = execute_sql(
            "SELECT SUM(payload), MIN(payload), COUNT(*) FROM b "
            "WHERE payload % 3 = 0", db,
        )
        assert r.columns["count"][0] == len(sel)
        assert r.columns["sum"][0] == np.int32(sel.sum())
        assert r.columns["min"][0] == sel.min()

    def test_global_aggregate_over_join(self, db):
        ak = np.asarray(db["a"].keys)
        ap = np.asarray(db["a"].payloads)
        bk = np.asarray(db["b"].keys)
        amap = {int(k): int(p) for k, p in zip(ak, ap)}
        matched = [amap[int(k)] for k in bk if int(k) in amap]
        r = execute_sql(
            "SELECT SUM(a.payload), COUNT(*) FROM b JOIN a USING (key)",
            db,
        )
        assert r.columns["count"][0] == len(matched)
        assert r.columns["sum"][0] == np.int32(np.sum(matched, dtype=np.int64))

    def test_empty_after_filter(self, db):
        r = execute_sql(
            "SELECT COUNT(*), SUM(payload), MIN(payload) FROM b "
            "WHERE payload > 1000", db,
        )
        assert r.columns["count"][0] == 0
        assert r.columns["sum"][0] == 0
        assert r.columns["min"][0] == 0  # masked-row convention

    def test_fluent_aggregate_terminal(self, db):
        from partitionedhashjoin_tpu.query import scan

        bp = np.asarray(db["b"].payloads)
        r = scan(db["b"]).filter(lambda k, p: p > 0).aggregate(
            with_distinct=True
        )
        sel = bp[bp > 0]
        assert int(r.count) == len(sel)
        assert int(r.sum) == int(np.int32(sel.sum()))
        assert int(r.distinct) == len(set(sel.tolist()))

    def test_aggregate_on_sharded_inputs(self, db):
        # the docstring claim: reductions jit to collectives on sharded
        # arrays — run aggregate() over a mesh-sharded relation
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from partitionedhashjoin_tpu.data.table import make_table
        from partitionedhashjoin_tpu.parallel.mesh import SHARD_AXIS
        from partitionedhashjoin_tpu.query import scan

        devs = np.array(jax.devices()[:8])
        if devs.size < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(devs, (SHARD_AXIS,))
        n = 4096  # divisible by 8
        keys = np.arange(n, dtype=np.int32)
        pays = (np.arange(n, dtype=np.int32) * 7) % 101 - 50
        sh = NamedSharding(mesh, P(SHARD_AXIS))
        t = make_table(
            jax.device_put(keys, sh), jax.device_put(pays, sh)
        )
        r = scan(t).filter(lambda k, p: p % 2 == 0).aggregate()
        sel = pays[pays % 2 == 0]
        assert int(r.count) == len(sel)
        assert int(r.sum) == int(np.int32(sel.sum()))
        assert int(r.min) == sel.min() and int(r.max) == sel.max()


class TestSelectDistinct:
    def test_distinct_key(self, db):
        bk = np.asarray(db["b"].keys)
        r = execute_sql("SELECT DISTINCT key FROM b ORDER BY key", db)
        np.testing.assert_array_equal(r.columns["key"], np.unique(bk))
        assert list(r.columns) == ["key"]

    def test_distinct_key_filtered_limit(self, db):
        bk = np.asarray(db["b"].keys)
        want = np.unique(bk[bk % 2 == 1])[:5]
        r = execute_sql(
            "SELECT DISTINCT key FROM b WHERE key % 2 = 1 "
            "ORDER BY key LIMIT 5", db,
        )
        np.testing.assert_array_equal(r.columns["key"], want)

    def test_distinct_over_join(self, db):
        ak = np.asarray(db["a"].keys)
        bk = np.asarray(db["b"].keys)
        want = np.unique(bk[np.isin(bk, ak)])
        r = execute_sql(
            "SELECT DISTINCT key FROM b JOIN a USING (key) ORDER BY key",
            db,
        )
        np.testing.assert_array_equal(r.columns["key"], want)

    def test_distinct_payload_rejected(self, db):
        with pytest.raises(SqlError, match="DISTINCT supports"):
            execute_sql("SELECT DISTINCT payload FROM b", db)


class TestReviewFindingsHigh:
    """Regressions for the round-5 high-effort review pass."""

    def test_constant_where_conjunct(self, db):
        n = db["b"].size
        bp = np.asarray(db["b"].payloads)
        # constant-true, constant-false, and mixed with a real predicate
        assert execute_sql(
            "SELECT COUNT(*) FROM b WHERE 1 = 1", db
        ).columns["count"][0] == n
        assert execute_sql(
            "SELECT COUNT(*) FROM b WHERE 1 = 2", db
        ).columns["count"][0] == 0
        assert execute_sql(
            "SELECT COUNT(*) FROM b WHERE payload > 6 AND 2 > 1", db
        ).columns["count"][0] == int((bp > 6).sum())
        # and in a join query (assigned to the FROM side)
        r = execute_sql(
            "SELECT COUNT(*) FROM b JOIN a USING (key) WHERE 1 = 1", db
        )
        want = execute_sql(
            "SELECT COUNT(*) FROM b JOIN a USING (key)", db
        )
        assert r.columns["count"][0] == want.columns["count"][0]

    def test_order_by_distinct(self, db):
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        d = {
            int(k): len(set(bp[bk == k].tolist())) for k in np.unique(bk)
        }
        r = execute_sql(
            "SELECT key FROM b GROUP BY key ORDER BY distinct DESC "
            "LIMIT 3", db,
        )
        want_top = sorted(d.values(), reverse=True)[:3]
        got = [d[int(k)] for k in r.columns["key"]]
        assert got == want_top

    def test_limit_zero_dtypes_match_nonempty(self, db):
        r0 = execute_sql("SELECT key, payload FROM b LIMIT 0", db)
        r1 = execute_sql("SELECT key, payload FROM b LIMIT 1", db)
        for c in r1.columns:
            assert r0.columns[c].dtype == r1.columns[c].dtype, c
        g0 = execute_sql(
            "SELECT key, AVG(payload) FROM b GROUP BY key LIMIT 0", db
        )
        g1 = execute_sql(
            "SELECT key, AVG(payload) FROM b GROUP BY key LIMIT 1", db
        )
        for c in g1.columns:
            assert g0.columns[c].dtype == g1.columns[c].dtype, c


class TestAggregateArgValidation:
    """Review round-5b: SUM(key) etc. must be rejected, not silently
    compute over payload."""

    def test_scalar_aggregate_key_arg_rejected(self, db):
        for q in (
            "SELECT SUM(key) FROM b",
            "SELECT MIN(key) FROM b",
            "SELECT COUNT(DISTINCT key) FROM b",
        ):
            with pytest.raises(SqlError, match="payload"):
                execute_sql(q, db)

    def test_having_aggregate_key_arg_rejected(self, db):
        with pytest.raises(SqlError, match="payload"):
            execute_sql(
                "SELECT key FROM b GROUP BY key HAVING SUM(key) > 15", db
            )
        # the group KEY itself is still addressable as a plain column
        bk = np.asarray(db["b"].keys)
        r = execute_sql(
            "SELECT key FROM b GROUP BY key HAVING key > 40", db
        )
        assert sorted(r.columns["key"].tolist()) == sorted(
            int(k) for k in np.unique(bk) if k > 40
        )


class TestHaving:
    def _oracle(self, db, keep):
        bk = np.asarray(db["b"].keys)
        bp = np.asarray(db["b"].payloads)
        out = {}
        for k in np.unique(bk):
            sel = bp[bk == k]
            row = (len(sel), int(np.int32(sel.sum())), int(sel.min()),
                   int(sel.max()), len(set(sel.tolist())))
            if keep(int(k), *row):
                out[int(k)] = row[:4]
        return out

    def test_having_count(self, db):
        want = self._oracle(db, lambda k, c, s, mn, mx, d: c > 10)
        r = execute_sql(
            "SELECT key, COUNT(*), SUM(payload), MIN(payload), "
            "MAX(payload) FROM b GROUP BY key HAVING count > 10 "
            "ORDER BY key", db,
        )
        got = {
            int(r.columns["key"][i]): (
                int(r.columns["count"][i]), int(r.columns["sum"][i]),
                int(r.columns["min"][i]), int(r.columns["max"][i]),
            )
            for i in range(r.row_count)
        }
        assert got == want and len(want) > 0

    def test_having_aggregate_call_spelling(self, db):
        # COUNT(*) > 10 AND MIN(payload) < 0, plus a key condition
        want = self._oracle(
            db, lambda k, c, s, mn, mx, d: c > 10 and mn < 0 and k != 1
        )
        r = execute_sql(
            "SELECT key FROM b GROUP BY key "
            "HAVING COUNT(*) > 10 AND MIN(payload) < 0 AND key != 1",
            db,
        )
        assert sorted(r.columns["key"].tolist()) == sorted(want)

    def test_having_distinct_without_selecting_it(self, db):
        want = self._oracle(db, lambda k, c, s, mn, mx, d: d >= 8)
        r = execute_sql(
            "SELECT key FROM b GROUP BY key "
            "HAVING COUNT(DISTINCT payload) >= 8", db,
        )
        assert sorted(r.columns["key"].tolist()) == sorted(want)

    def test_having_then_order_limit(self, db):
        want = self._oracle(db, lambda k, c, s, mn, mx, d: c > 5)
        top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:3]
        r = execute_sql(
            "SELECT key, COUNT(*) FROM b GROUP BY key HAVING count > 5 "
            "ORDER BY count DESC LIMIT 3", db,
        )
        assert r.columns["count"].tolist() == [c for _, (c, *_) in top]

    def test_having_count_terminal(self, db):
        # .count() over a having-filtered group plan = surviving groups
        from partitionedhashjoin_tpu.sql import plan_sql

        want = self._oracle(db, lambda k, c, s, mn, mx, d: c > 10)
        q = plan_sql(
            "SELECT key FROM b GROUP BY key HAVING count > 10", db
        )
        assert q.count() == len(want)

    def test_having_requires_group_by(self, db):
        with pytest.raises(SqlError, match="HAVING requires GROUP BY"):
            execute_sql("SELECT key FROM b HAVING count > 1", db)

    def test_having_rejects_row_columns(self, db):
        with pytest.raises(SqlError, match="group columns"):
            execute_sql(
                "SELECT key FROM b GROUP BY key HAVING payload > 1", db
            )

    def test_having_on_join_group(self, db):
        ak = np.asarray(db["a"].keys)
        bk = np.asarray(db["b"].keys)
        in_a = np.isin(bk, ak)
        kk = bk[in_a]
        counts = {int(k): int((kk == k).sum()) for k in np.unique(kk)}
        want = {k for k, c in counts.items() if c >= 4}
        r = execute_sql(
            "SELECT key FROM b JOIN a USING (key) GROUP BY key "
            "HAVING COUNT(*) >= 4", db,
        )
        assert set(r.columns["key"].tolist()) == want

    def test_fluent_having_chain(self, db):
        # two .having() calls AND together
        from partitionedhashjoin_tpu.query import scan

        want = self._oracle(
            db, lambda k, c, s, mn, mx, d: c > 5 and mx >= 90
        )
        g = (
            scan(db["b"]).group_by()
            .having(lambda g: g.count > 5)
            .having(lambda g: g.max >= 90)
            .execute()
        )
        n = int(g.num_groups)
        assert sorted(np.asarray(g.keys)[:n].tolist()) == sorted(want)


class TestReviewFindings:
    """Regression tests for the round-5 code-review findings."""

    def _small(self):
        a = _t([1, 2, 3], [100, 200, 300])
        b = _t([1, 2, 3, 7], [11, 22, 33, 77])
        return {"a": a, "b": b}

    def test_build_payload_with_tail_carries_build(self):
        db = self._small()
        r = execute_sql(
            "SELECT key, a.payload FROM b JOIN a USING (key) "
            "ORDER BY key ASC LIMIT 3", db,
        )
        assert r.columns["payload_build"].tolist() == [100, 200, 300]
        # and the probe-side selection still carries the probe column
        r2 = execute_sql(
            "SELECT key, b.payload FROM b JOIN a USING (key) "
            "ORDER BY key ASC LIMIT 3", db,
        )
        assert r2.columns["payload_probe"].tolist() == [11, 22, 33]

    def test_star_with_tail_on_join_rejected(self):
        with pytest.raises(SqlError, match="single.*payload|carries"):
            execute_sql(
                "SELECT * FROM b JOIN a USING (key) ORDER BY key LIMIT 2",
                self._small(),
            )

    def test_mixed_payload_sides_with_tail_rejected(self):
        with pytest.raises(SqlError, match="one payload column"):
            execute_sql(
                "SELECT a.payload, b.payload FROM b JOIN a USING (key) "
                "ORDER BY key LIMIT 2", self._small(),
            )

    def test_count_limit_is_result_rows(self):
        # LIMIT limits RESULT rows; COUNT(*) produces one row, so the
        # count must be the full 4, not min(4, 2)
        db = self._small()
        r = execute_sql("SELECT COUNT(*) FROM b LIMIT 2", db)
        assert r.columns["count"][0] == 4

    def test_limit_zero_empty(self):
        db = self._small()
        for q in (
            "SELECT * FROM b LIMIT 0",
            "SELECT COUNT(*) FROM b LIMIT 0",
            "SELECT key, COUNT(*) FROM b GROUP BY key LIMIT 0",
        ):
            r = execute_sql(q, db)
            assert r.row_count == 0, q
            assert all(len(v) == 0 for v in r.columns.values())

    def test_unqualified_aggregate_in_join_rejected(self):
        with pytest.raises(SqlError, match="qualify aggregate"):
            execute_sql(
                "SELECT key, SUM(payload) FROM b JOIN a USING (key) "
                "GROUP BY key", self._small(),
            )

    def test_plan_errors_wrapped_as_sql_error(self):
        # a fluent-layer PlanError surfaces as SqlError (one contract)
        db = self._small()
        with pytest.raises(SqlError):
            # group-stage ORDER BY column that doesn't exist
            execute_sql(
                "SELECT key FROM b GROUP BY key ORDER BY payload", db
            )


class TestInt64Sql:
    def test_int64_keys_end_to_end(self):
        # int64 relations (reference Tuple::id is int64, Table.hpp:20-25):
        # the dialect inherits the engine's x64 paths unchanged
        import jax

        with jax.enable_x64(True):
            rng = np.random.default_rng(7)
            big = np.int64(1) << 40
            a = make_table(
                np.arange(20, dtype=np.int64) + big,
                np.arange(20, dtype=np.int64) * 3,
            )
            bk = rng.integers(0, 30, 200).astype(np.int64) + big
            b = make_table(bk, rng.integers(-50, 50, 200).astype(np.int64))
            db = {"a": a, "b": b}
            hits = int(np.isin(bk, np.asarray(a.keys)).sum())
            r = execute_sql("SELECT COUNT(*) FROM b JOIN a USING (key)", db)
            assert r.columns["count"][0] == hits
            bp = np.asarray(b.payloads)
            g = execute_sql(
                "SELECT key, COUNT(*), SUM(payload) FROM b GROUP BY key "
                "HAVING count > 5 ORDER BY key", db,
            )
            assert g.row_count > 0
            for i, k in enumerate(g.columns["key"]):
                sel = bp[bk == k]
                assert len(sel) > 5
                assert g.columns["sum"][i] == sel.sum()  # exact: int64
            s = execute_sql(
                "SELECT SUM(payload), COUNT(DISTINCT payload) FROM b", db
            )
            assert s.columns["sum"][0] == bp.sum()
            assert s.columns["distinct"][0] == len(set(bp.tolist()))


class TestExplain:
    def test_explain_statement_syntax(self, db):
        r = execute_sql(
            "EXPLAIN SELECT key, COUNT(*) FROM b JOIN a USING (key) "
            "GROUP BY key ORDER BY count DESC LIMIT 5", db,
        )
        text = "\n".join(r.columns["plan"].tolist())
        assert "physical plan" in text and r.row_count > 2
        # count statements show the R1 count plan, not materialization
        rc = execute_sql(
            "EXPLAIN SELECT COUNT(*) FROM b JOIN a USING (key)", db
        )
        tc = "\n".join(rc.columns["plan"].tolist())
        assert "count" in tc and "R1" in tc
        # scalar aggregates note their reduction
        rs = execute_sql("EXPLAIN SELECT SUM(payload) FROM b", db)
        assert any(
            "scalar reductions" in s for s in rs.columns["plan"]
        )

    def test_explain_shows_rules(self, db):
        txt = explain_sql(
            "SELECT key, COUNT(*) FROM b JOIN a USING (key) "
            "WHERE b.payload % 2 = 0 GROUP BY key "
            "ORDER BY count DESC LIMIT 5",
            db,
        )
        assert "physical plan" in txt
        assert "R" in txt  # rewrite rules fired

    def test_explain_does_not_execute(self, db):
        # planning is host-side; a huge LIMIT is fine to explain
        txt = explain_sql("SELECT * FROM b LIMIT 7", db)
        assert "limit 7" in txt


class TestShellEntry:
    """argv-level tests of python -m partitionedhashjoin_tpu.sql."""

    def test_count_over_generated(self, capsys):
        from partitionedhashjoin_tpu.sql import main

        rc = main([
            "--table", "b=sequential:100",
            "SELECT COUNT(*) FROM b WHERE key <= 40",
        ])
        out = capsys.readouterr().out.splitlines()
        assert rc == 0
        assert out[0] == "count" and out[1] == "40"  # keys start at 1

    def test_join_over_specs(self, capsys):
        from partitionedhashjoin_tpu.sql import main

        rc = main([
            "--table", "a=sequential:50",
            "--table", "b=uniform:300:1:50:7",
            "SELECT COUNT(*) FROM b JOIN a USING (key)",
        ])
        out = capsys.readouterr().out.splitlines()
        assert rc == 0 and out[1] == "300"  # uniform [1,50] all match

    def test_explain_flag_and_statement(self, capsys):
        from partitionedhashjoin_tpu.sql import main

        rc = main([
            "--table", "b=sequential:64", "--explain",
            "SELECT key FROM b ORDER BY key DESC LIMIT 3",
        ])
        out = capsys.readouterr().out
        assert rc == 0 and "physical plan" in out
        rc = main([
            "--table", "b=sequential:64",
            "EXPLAIN SELECT COUNT(*) FROM b",
        ])
        out = capsys.readouterr().out
        assert rc == 0 and "plan" in out and "R1" in out

    def test_max_rows_truncation(self, capsys):
        from partitionedhashjoin_tpu.sql import main

        rc = main([
            "--table", "b=sequential:40", "--max-rows", "5",
            "SELECT * FROM b",
        ])
        out = capsys.readouterr().out
        assert rc == 0 and "... (40 rows total)" in out

    def test_mesh_flag(self, capsys):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from partitionedhashjoin_tpu.sql import main

        rc = main([
            "--table", "a=sequential:64",
            "--table", "b=zipf:512:1.05:1:64:3",
            "--mesh", "8",
            "SELECT COUNT(*) FROM b JOIN a USING (key)",
        ])
        out = capsys.readouterr().out.splitlines()
        assert rc == 0 and out[1] == "512"

    def test_bad_table_spec(self):
        from partitionedhashjoin_tpu.sql import SqlError, main

        with pytest.raises(SqlError, match="table spec"):
            main(["--table", "b=nonsense:5", "SELECT * FROM b"])
        with pytest.raises(SystemExit):
            main(["--table", "justaname", "SELECT * FROM b"])


class TestMeshSql:
    def test_mesh_count_and_topk(self, db):
        import jax
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:8])
        if devs.size < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(devs, ("shards",))
        r = execute_sql(
            "SELECT COUNT(*) FROM b JOIN a USING (key)", db, mesh=mesh
        )
        want = execute_sql(
            "SELECT COUNT(*) FROM b JOIN a USING (key)", db
        )
        assert r.columns["count"][0] == want.columns["count"][0]
        rt = execute_sql(
            "SELECT * FROM b ORDER BY payload DESC LIMIT 4", db,
            mesh=mesh,
        )
        bp = np.asarray(db["b"].payloads)
        np.testing.assert_array_equal(
            rt.columns["payload"], np.sort(bp)[::-1][:4]
        )

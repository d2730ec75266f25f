"""N-D array subset on ArrayType columns (reference blaze/expr/arrays.py:
13-129, axis reductions reductions.py:49-64) — asserted against numpy."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vt(spark):
    from blaze_spark import data

    return data(
        [(1, [1.0, 2.0, 3.0, 4.0], [10.0, 20.0, 30.0, 40.0]),
         (2, [0.5, -1.5, 2.5, 0.0], [2.0, 4.0, 6.0, 8.0])],
        spark=spark,
        schema="id int, v array<double>, w array<double>", name="vt")


@pytest.fixture(scope="module")
def mt2(spark):
    from blaze_spark import data

    return data(
        [(1, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
         (2, [[0.0, 1.0, 0.0], [2.0, 0.0, 2.0]])],
        spark=spark,
        schema="id int, m array<array<double>>", name="mt2")


def vals(t, e, name="r"):
    return {r.id: r[name] for r in t.transform(**{name: e}).df.collect()}


def np_rows(t, col):
    return {r.id: np.array(r[col]) for r in t.df.collect()}


def test_elementwise_vec_vec(vt):
    got = vals(vt, vt.v.arr + vt.w)
    v, w = np_rows(vt, "v"), np_rows(vt, "w")
    for i in got:
        assert np.allclose(got[i], v[i] + w[i])
    got = vals(vt, vt.v.arr * vt.w)
    for i in got:
        assert np.allclose(got[i], v[i] * w[i])


def test_elementwise_scalar_broadcast(vt):
    v = np_rows(vt, "v")
    for e, fn in [(vt.v.arr * 2.0, lambda x: x * 2),
                  (vt.v.arr - 1, lambda x: x - 1),
                  (vt.v.arr / 4.0, lambda x: x / 4)]:
        got = vals(vt, e)
        for i in got:
            assert np.allclose(got[i], fn(v[i]))


def test_indexing_python_semantics(vt):
    v = np_rows(vt, "v")
    assert vals(vt, vt.v.arr[0]) == {i: a[0] for i, a in v.items()}
    assert vals(vt, vt.v.arr[-1]) == {i: a[-1] for i, a in v.items()}
    got = vals(vt, vt.v.arr[1:3])
    for i in got:
        assert got[i] == list(v[i][1:3])
    got = vals(vt, vt.v.arr[-3:-1])
    for i in got:
        assert got[i] == list(v[i][-3:-1])


def test_vec_reductions(vt):
    v = np_rows(vt, "v")
    got = vals(vt, vt.v.arr.sum())
    for i in got:
        assert got[i] == pytest.approx(v[i].sum())
    got = vals(vt, vt.v.arr.mean())
    for i in got:
        assert got[i] == pytest.approx(v[i].mean())
    got = vals(vt, vt.v.arr.norm())
    for i in got:
        assert got[i] == pytest.approx(np.linalg.norm(v[i]))


def test_vec_dot(vt):
    v, w = np_rows(vt, "v"), np_rows(vt, "w")
    got = vals(vt, vt.v.arr.dot(vt.w))
    for i in got:
        assert got[i] == pytest.approx(v[i] @ w[i])


def test_matrix_transpose(mt2):
    m = np_rows(mt2, "m")
    got = vals(mt2, mt2.m.arr.T)
    for i in got:
        assert np.allclose(np.array(got[i]), m[i].T)


def test_matrix_axis_reductions(mt2):
    m = np_rows(mt2, "m")
    for axis in (None, 0, 1):
        got_s = vals(mt2, mt2.m.arr.sum(axis))
        got_m = vals(mt2, mt2.m.arr.mean(axis))
        for i in m:
            assert np.allclose(got_s[i], m[i].sum(axis=axis))
            assert np.allclose(got_m[i], m[i].mean(axis=axis))


def test_matrix_vector_dot(mt2, spark):
    from blaze_spark import data

    m = np_rows(mt2, "m")
    t = data([(1, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], [1.0, 0.0, 2.0]),
              (2, [[0.0, 1.0, 0.0], [2.0, 0.0, 2.0]], [3.0, 1.0, 1.0])],
             spark=spark,
             schema="id int, m array<array<double>>, x array<double>",
             name="mvt")
    got = vals(t, t.m.arr.dot(t.x))
    for r in t.df.collect():
        assert np.allclose(got[r.id], np.array(r.m) @ np.array(r.x))


def test_matrix_matrix_dot(spark):
    from blaze_spark import data

    a = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]          # 3x2
    b = [[1.0, 0.0, 1.0], [2.0, 1.0, 0.0]]            # 2x3
    t = data([(1, a, b)], spark=spark,
             schema="id int, a array<array<double>>, b array<array<double>>",
             name="mmt")
    got = vals(t, t.a.arr.dot(t.b))
    assert np.allclose(np.array(got[1]), np.array(a) @ np.array(b))


def test_transpose_requires_2d(vt):
    with pytest.raises(ValueError):
        vt.v.arr.transpose()


def test_arr_accessor_rejects_scalar(vt):
    with pytest.raises(TypeError):
        vt.id.arr  # noqa: B018


def test_array_ops_stay_jvm_side(vt):
    """No Python UDF: the whole expression is a single codegen'd Project."""
    from blaze_spark.plans import physical_plan

    q = vt.transform(r=(vt.v.arr * 2.0).arr.dot(vt.w))
    plan = physical_plan(q)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

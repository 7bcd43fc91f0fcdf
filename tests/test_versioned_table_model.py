"""Model-based check of the versioned table: random op sequences vs a dict.

Hypothesis drives short random sequences of merge / delete_where /
compact against one table; a plain Python dict models the expected
key->value state after every op. Any divergence (lost rows, resurrected
deletes, merge clobbering the wrong keys, compaction changing data) is
a counterexample.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from marketing_etl_analytics_spark.sources import acid

KEYS = st.integers(min_value=0, max_value=9)

OPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), st.dictionaries(KEYS, st.integers(0, 99),
                                                    min_size=1, max_size=4)),
        st.tuples(st.just("delete_le"), KEYS),
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(initial=st.dictionaries(KEYS, st.integers(0, 99), min_size=1, max_size=5),
       ops=OPS)
def test_random_op_sequences_match_dict_model(spark, tmp_path_factory, initial, ops):
    path = str(tmp_path_factory.mktemp("vt") / "tbl")
    model = dict(initial)
    acid.create(
        spark, path,
        spark.createDataFrame(list(initial.items()), "k long, v long"),
    )
    for op, arg in ops:
        if op == "merge":
            model.update(arg)
            acid.merge(
                spark, path,
                spark.createDataFrame(list(arg.items()), "k long, v long"),
                ["k"],
            )
        elif op == "delete_le":
            model = {k: v for k, v in model.items() if not k <= arg}
            acid.delete_where(spark, path, f"k <= {arg}")
        else:
            acid.compact(spark, path, 1)
    got = {r.k: r.v for r in acid.read(spark, path).collect()}
    assert got == model

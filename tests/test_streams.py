"""DataStream epoch iteration — parity with reference
tests/test_streams.py behaviors (epoch order, shuffling, batching)."""

import numpy as np

from fuel_spark.sources import from_rows
from fuel_spark.streams import DataStream


def _df(spark, n=10):
    return from_rows(
        spark, [(i, i * 1.5) for i in range(n)], schema="k bigint, v double"
    )


def test_sequential_epoch_batches(spark):
    ds = DataStream(_df(spark), "k", batch_size=4)
    assert ds.sources == ("k", "v")
    batches = list(ds.get_epoch_iterator())
    assert [len(b["k"]) for b in batches] == [4, 4, 2]
    assert batches[0]["k"].tolist() == [0, 1, 2, 3]
    assert np.allclose(batches[0]["v"], [0.0, 1.5, 3.0, 4.5])
    assert batches[2]["k"].tolist() == [8, 9]


def test_tuple_batches(spark):
    ds = DataStream(_df(spark), "k", batch_size=5)
    first = next(ds.get_epoch_iterator(as_dict=False))
    assert isinstance(first, tuple) and len(first) == 2
    assert first[0].tolist() == [0, 1, 2, 3, 4]


def test_shuffled_epochs_differ_and_reset(spark):
    ds = DataStream(_df(spark, 20), "k", batch_size=20, shuffled=True, seed=3)
    e0 = next(ds.get_epoch_iterator())["k"].tolist()
    e1 = next(ds.get_epoch_iterator())["k"].tolist()
    assert sorted(e0) == sorted(e1) == list(range(20))
    assert e0 != e1  # fresh permutation per epoch
    ds.reset()
    assert next(ds.get_epoch_iterator())["k"].tolist() == e0  # reproducible


def test_epoch_covers_all_examples_once(spark):
    ds = DataStream(_df(spark, 17), "k", batch_size=5, shuffled=True)
    seen = [k for b in ds.get_epoch_iterator() for k in b["k"].tolist()]
    assert sorted(seen) == list(range(17))

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


def test_resume_mid_epoch_identical_remainder(spark):
    """fuel's checkpoint contract (reference fuel/iterator.py:8,
    tests/test_serialization.py): interrupt after k batches, resume,
    and the remainder is bit-identical to an uninterrupted epoch."""
    mk = lambda: DataStream(_df(spark, 23), "k", batch_size=5, shuffled=True, seed=7)
    full = [b["k"].tolist() for b in mk().get_epoch_iterator()]  # epoch 0
    ds = mk()
    it = ds.get_epoch_iterator()
    consumed = [next(it)["k"].tolist() for _ in range(2)]  # "crash" after 2
    del it
    resumed = [b["k"].tolist() for b in mk().resume(0, 2)]
    assert consumed == full[:2]
    assert resumed == full[2:]
    # resume also re-aims the epoch counter: next epoch is epoch 1
    ds2 = mk()
    _ = list(ds2.resume(0, 2))
    next_epoch = [b["k"].tolist() for b in ds2.get_epoch_iterator()]
    ds3 = mk()
    _ = list(ds3.get_epoch_iterator())
    assert next_epoch == [b["k"].tolist() for b in ds3.get_epoch_iterator()]


def test_resume_sequential_and_edge_batches(spark):
    ds = DataStream(_df(spark, 10), "k", batch_size=4)
    # resume at 0 == full epoch; at last partial batch; past the end
    assert [b["k"].tolist() for b in ds.resume(0, 0)] == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert [b["k"].tolist() for b in ds.resume(0, 2)] == [[8, 9]]
    assert list(ds.resume(0, 3)) == []

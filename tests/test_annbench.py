"""ANN-benchmarks HDF5 source (SURVEY §2 S1): registry validation, the
import gate (h5py is absent in this sandbox — the production error path is
the real one here), and the chunked convert → parquet → DataFrame path via
an injected in-memory h5py stand-in that mimics the reference's file
layout (train/test/neighbors/distances, datasets.py:71-74)."""

import sys
import types

import numpy as np
import pytest

from lsh_qd_spark.annbench import ANN_BENCHMARKS, AnnBenchmarkSource


def test_registry_validation():
    with pytest.raises(ValueError, match="unknown dataset"):
        AnnBenchmarkSource("not-a-dataset")
    with pytest.raises(ValueError, match="valid dimensions"):
        AnnBenchmarkSource("glove", dimension=33)
    src = AnnBenchmarkSource("glove")
    assert src.dimension == 25  # first registered dim, like the reference
    assert src.filename == "glove-25-angular.hdf5"
    assert AnnBenchmarkSource("lastfm").distance == "dot"
    assert set(ANN_BENCHMARKS["glove"]["dims"]) == {25, 50, 100, 200}


def test_h5py_import_gate(tmp_path):
    """h5py is genuinely absent in this environment: the loader must fail
    with the package named, not an opaque ModuleNotFoundError mid-read."""
    assert "h5py" not in sys.modules
    src = AnnBenchmarkSource("sift", data_dir=str(tmp_path))
    with pytest.raises(ImportError, match="h5py is required"):
        src.convert(str(tmp_path / "out"))


class _FakeDataset:
    def __init__(self, arr):
        self._arr = np.asarray(arr)
        self.shape = self._arr.shape

    def __getitem__(self, idx):
        return self._arr[idx]


class _FakeFile:
    def __init__(self, datasets):
        self._datasets = datasets

    def __getitem__(self, key):
        return _FakeDataset(self._datasets[key])

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


@pytest.fixture()
def fake_h5py(monkeypatch):
    """Inject a minimal h5py stand-in exposing exactly the surface the
    loader touches: File(path, 'r') → mapping of array-like datasets."""
    datasets = {}
    mod = types.ModuleType("h5py")
    mod.File = lambda path, mode: _FakeFile(datasets)
    monkeypatch.setitem(sys.modules, "h5py", mod)
    return datasets


def test_missing_file_is_loud(tmp_path, fake_h5py):
    src = AnnBenchmarkSource("mnist", data_dir=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="mnist-784-euclidean.hdf5"):
        src.convert(str(tmp_path / "out"))


def _plant(tmp_path, fake_h5py, n_train=37, n_test=9, dim=4, k=3):
    rng = np.random.default_rng(11)
    fake_h5py["train"] = rng.normal(3.0, 2.0, (n_train, dim))
    fake_h5py["test"] = rng.normal(3.0, 2.0, (n_test, dim))
    fake_h5py["neighbors"] = rng.integers(0, n_train, (n_test, k))
    fake_h5py["distances"] = rng.random((n_test, k)).astype(np.float32)
    src = AnnBenchmarkSource(
        "glove",
        dimension=50,
        data_dir=str(tmp_path),
        chunk_rows=10,  # < n_train: exercises multi-chunk streaming
    )
    # the loader existence-checks the HDF5 path before opening
    (tmp_path / src.filename).write_bytes(b"")
    return src


def test_convert_and_read(spark, tmp_path, fake_h5py):
    src = _plant(tmp_path, fake_h5py)
    out = str(tmp_path / "out")
    assert not AnnBenchmarkSource.converted(out)
    src.convert(out)
    assert AnnBenchmarkSource.converted(out)

    train = AnnBenchmarkSource.train_df(spark, out)
    test = AnnBenchmarkSource.test_df(spark, out)
    assert dict(train.dtypes) == {"id": "bigint", "embedding": "array<float>"}
    assert dict(test.dtypes) == {
        "query_id": "bigint",
        "embedding": "array<float>",
        "neighbor_ids": "array<bigint>",
        "neighbor_dists": "array<float>",
    }
    assert train.count() == 37 and test.count() == 9

    # normalization = the reference's global min-max over train ∪ test
    # (datasets.py:78-84), applied chunk-streamed; compare exactly
    raw_tr = np.asarray(fake_h5py["train"], dtype=np.float64)
    raw_te = np.asarray(fake_h5py["test"], dtype=np.float64)
    lo = min(raw_tr.min(), raw_te.min())
    hi = max(raw_tr.max(), raw_te.max())
    want = ((raw_tr - lo) / (hi - lo)).astype(np.float32)
    got = {
        r["id"]: np.asarray(r["embedding"], dtype=np.float32)
        for r in train.collect()
    }
    assert sorted(got) == list(range(37))
    for i in range(37):
        np.testing.assert_array_equal(got[i], want[i])
    assert all(0.0 <= v <= 1.0 for arr in got.values() for v in arr)

    # ground-truth columns ride through untouched
    row = test.where("query_id = 5").collect()[0]
    np.testing.assert_array_equal(
        np.asarray(row["neighbor_ids"]), np.asarray(fake_h5py["neighbors"][5])
    )
    np.testing.assert_array_equal(
        np.asarray(row["neighbor_dists"], dtype=np.float32),
        np.asarray(fake_h5py["distances"][5], dtype=np.float32),
    )


def test_convert_unnormalized_and_parallel_scan(spark, tmp_path, fake_h5py):
    src = _plant(tmp_path, fake_h5py)
    src = AnnBenchmarkSource(
        "glove",
        dimension=50,
        data_dir=str(tmp_path),
        normalize=False,
        chunk_rows=10,
    )
    out = str(tmp_path / "raw")
    src.convert(out)
    train = AnnBenchmarkSource.train_df(spark, out)
    raw = np.asarray(fake_h5py["train"], dtype=np.float32)
    got = {
        r["id"]: np.asarray(r["embedding"], dtype=np.float32)
        for r in train.collect()
    }
    for i in range(37):
        np.testing.assert_array_equal(got[i], raw[i])
    # one row group per chunk → a parallel scan gets ceil(37/10) splits
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(
        str(tmp_path / "raw" / "train" / "part-0.parquet")
    ).metadata
    assert meta.num_row_groups == 4


def test_normalize_matches_reference_float32_arithmetic(
    spark, tmp_path, fake_h5py
):
    """Bit-for-bit parity pin for the docstring's claim: the reference
    (datasets.py:77-81) subtracts/divides NATIVE-dtype scalars — np.min of
    a float32 array is a float32 scalar, so float32 data normalizes in
    float32 arithmetic. A float64 intermediate rounds differently by 1 ulp
    on routine inputs; the converter must reproduce the float32 math."""
    rng = np.random.default_rng(7)
    train = rng.normal(3.0, 2.0, (23, 4)).astype(np.float32)
    test = rng.normal(3.0, 2.0, (5, 4)).astype(np.float32)
    fake_h5py["train"] = train
    fake_h5py["test"] = test
    fake_h5py["neighbors"] = rng.integers(0, 23, (5, 3))
    fake_h5py["distances"] = rng.random((5, 3)).astype(np.float32)
    src = AnnBenchmarkSource(
        "glove", dimension=50, data_dir=str(tmp_path), chunk_rows=10
    )
    (tmp_path / src.filename).write_bytes(b"")
    src.convert(str(tmp_path / "out"))

    # reference arithmetic, verbatim dtype semantics
    lo = min(np.min(train), np.min(test))   # float32 scalar
    hi = max(np.max(train), np.max(test))
    want = (train - lo) / (hi - lo)          # float32 throughout
    assert want.dtype == np.float32

    got_rows = (
        src.train_df(spark, str(tmp_path / "out"))
        .orderBy("id")
        .collect()
    )
    got = np.array([r["embedding"] for r in got_rows], dtype=np.float32)
    assert np.array_equal(got, want), (
        np.abs(got.astype(np.float64) - want.astype(np.float64)).max()
    )


def test_partial_conversion_not_reported_converted(tmp_path):
    """ParquetWriter creates part-0.parquet at open, so a conversion
    killed mid-write leaves both files present but footer-less —
    converted() must key on the completion marker written LAST, not on
    file existence."""
    out = tmp_path / "out"
    for t in ("train", "test"):
        (out / t).mkdir(parents=True)
        (out / t / "part-0.parquet").write_bytes(b"PAR1")  # no footer
    assert not AnnBenchmarkSource.converted(str(out))

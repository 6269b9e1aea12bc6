"""Dataset loader tests against synthetic fixtures in the real on-disk
formats (Planetoid ind.* pickles, OGB extracted layout, generic npz)."""

import gzip
import os
import pickle

import numpy as np
import pytest

from gnn_tpu.graphs.datasets import load_dataset, load_npz, load_planetoid, load_ogbn


def test_npz_round_trip(tmp_path, rng):
    n, e, f = 30, 80, 5
    path = str(tmp_path / "toy.npz")
    np.savez(
        path,
        x=rng.normal(size=(n, f)).astype(np.float32),
        edge_index=np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]),
        y=rng.integers(0, 3, n),
        train_mask=np.arange(n) < 10,
    )
    d = load_npz(path)
    assert d.num_nodes == n and d.num_edges == e and d.num_features == f
    assert int(d.train_mask.sum()) == 10
    with pytest.raises(FileNotFoundError):
        load_npz(str(tmp_path / "missing.npz"))


def _write_planetoid_fixture(root, name="cora", n_allx=8, n_test=4, f=6, c=3):
    """Synthetic graph in the exact ind.* pickle layout (incl. the shuffled
    test-index file the loaders must unscramble)."""
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    n = n_allx + n_test
    # features: row i of the FINAL graph == i * ones (so we can verify the
    # test-row unscrambling exactly)
    final_x = np.arange(n)[:, None] * np.ones((1, f), np.float32)
    final_y = np.eye(c, dtype=np.int64)[np.arange(n) % c]
    test_ids = np.arange(n_allx, n)
    shuffled = rng.permutation(test_ids)
    allx = final_x[:n_allx]
    ally = final_y[:n_allx]
    # tx rows are stored in test.index-file (SHUFFLED) order — tx[i] is the
    # feature row of node shuffled[i] (Kipf Planetoid convention)
    tx = final_x[shuffled]
    ty = final_y[shuffled]
    x = allx[:3]
    y = ally[:3]
    graph = {i: [int((i + 1) % n)] for i in range(n)}
    for k, obj in [
        ("x", x), ("tx", tx), ("allx", allx),
        ("y", y), ("ty", ty), ("ally", ally), ("graph", graph),
    ]:
        with open(os.path.join(raw, f"ind.{name}.{k}"), "wb") as fh:
            pickle.dump(obj, fh)
    np.savetxt(os.path.join(raw, f"ind.{name}.test.index"), shuffled, fmt="%d")
    return n, f, final_x


def test_planetoid_fixture(tmp_path):
    n, f, final_x = _write_planetoid_fixture(str(tmp_path))
    d = load_planetoid("cora", str(tmp_path))
    assert d.num_nodes == n and d.num_features == f
    # test rows landed at their true (shuffled) node ids
    np.testing.assert_allclose(np.asarray(d.x), final_x)
    assert int(d.test_mask.sum()) == 4
    assert d.num_edges == 2 * n  # undirected ring


def test_planetoid_missing_files(tmp_path):
    with pytest.raises(FileNotFoundError, match="raw files not found"):
        load_planetoid("cora", str(tmp_path))


def test_ogbn_npz_fixture(tmp_path, rng):
    base = tmp_path / "ogbn_toy" / "raw"
    base.mkdir(parents=True)
    n, e, f = 20, 50, 4
    np.savez(
        str(base / "data.npz"),
        node_feat=rng.normal(size=(n, f)).astype(np.float32),
        edge_index=np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]),
        node_label=rng.integers(0, 5, (n, 1)),
    )
    split = tmp_path / "ogbn_toy" / "split" / "time"
    split.mkdir(parents=True)
    import pandas as pd

    for part, ids in [("train", range(0, 10)), ("valid", range(10, 15)), ("test", range(15, 20))]:
        pd.DataFrame(list(ids)).to_csv(
            str(split / f"{part}.csv.gz"), index=False, header=False, compression="gzip"
        )
    d = load_ogbn("ogbn-toy", str(tmp_path))
    assert d.num_nodes == n and d.num_features == f
    assert int(d.train_mask.sum()) == 10
    assert int(d.val_mask.sum()) == 5
    assert int(d.test_mask.sum()) == 5


def test_unknown_dataset_error():
    with pytest.raises(ValueError, match="unknown dataset"):
        load_dataset("not-a-dataset")

"""Native C++ CSV loader: parity with the numpy parser + speed sanity."""

import time

import numpy as np
import pytest

from mamdr_tpu.data.native_loader import get_lib, load_csv_native


def write_csv(path, n, rng):
    uid = rng.integers(0, 10000, n)
    pid = rng.integers(0, 10000, n)
    dom = rng.integers(0, 30, n)
    label = rng.integers(0, 2, n)
    with open(path, "w") as f:
        f.write("uid,pid,domain,label\n")
        for i in range(n):
            f.write(f"{uid[i]},{pid[i]},{dom[i]},{label[i]}\n")
    return uid, pid, dom, label


def test_native_lib_builds():
    assert get_lib() is not None, "native loader failed to build (g++ present?)"


def test_native_matches_reference_parse(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "d.csv")
    uid, pid, dom, label = write_csv(p, 5000, rng)
    got = load_csv_native(p)
    assert got is not None
    np.testing.assert_array_equal(got[0], uid.astype(np.int32))
    np.testing.assert_array_equal(got[1], pid.astype(np.int32))
    np.testing.assert_array_equal(got[2], dom.astype(np.int32))
    np.testing.assert_array_equal(got[3], label.astype(np.float32))


def test_native_float_labels_and_crlf(tmp_path):
    p = str(tmp_path / "f.csv")
    with open(p, "w") as f:
        f.write("uid,pid,domain,label\r\n1,2,0,0.5\r\n3,4,1,1\n")
    got = load_csv_native(p)
    assert got is not None
    np.testing.assert_allclose(got[3], [0.5, 1.0])
    np.testing.assert_array_equal(got[0], [1, 3])


def test_native_empty_and_malformed(tmp_path):
    empty = str(tmp_path / "e.csv")
    open(empty, "w").write("uid,pid,domain,label\n")
    got = load_csv_native(empty)
    assert got is not None and len(got[0]) == 0

    bad = str(tmp_path / "b.csv")
    open(bad, "w").write("uid,pid,domain,label\n1,notanint,0,1\n")
    assert load_csv_native(bad) is None  # falls back to numpy upstream


def test_domainsplit_uses_native(tmp_path):
    from mamdr_tpu.data.dataset import DomainSplit

    rng = np.random.default_rng(1)
    p = str(tmp_path / "train.csv")
    uid, *_ = write_csv(p, 2000, rng)
    split = DomainSplit.from_csv(p)
    assert split.n == 2000
    np.testing.assert_array_equal(split.uid, uid.astype(np.int32))


def test_native_is_fast(tmp_path):
    rng = np.random.default_rng(2)
    p = str(tmp_path / "big.csv")
    write_csv(p, 200_000, rng)
    t0 = time.time()
    got = load_csv_native(p)
    native_t = time.time() - t0
    assert got is not None and len(got[0]) == 200_000
    # 200k rows should parse in well under a second
    assert native_t < 1.0, f"native parse too slow: {native_t:.2f}s"

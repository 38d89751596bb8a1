"""Native IO runtime (native/tpu_knn_native.cpp via ctypes, numpy
fallbacks): readers, packers, Levenshtein oracle."""

import numpy as np
import pytest

from tpu_knn.io import native


def test_read_dense_text(tmp_path, rng):
    mat = rng.standard_normal((23, 7)).astype(np.float32)
    p = tmp_path / "dense.txt"
    np.savetxt(p, mat, fmt="%.6f")
    got = native.read_dense_text(str(p))
    np.testing.assert_allclose(got, mat, atol=1e-5)


def test_read_dense_text_blank_lines(tmp_path):
    p = tmp_path / "d.txt"
    p.write_text("1 2 3\n\n4 5 6\n   \n7 8 9\n")
    got = native.read_dense_text(str(p))
    assert got.shape == (3, 3) and got[2, 2] == 9.0


def test_read_sparse_text(tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("1:0.5 7:1.5\n2:2.0\n3:1.0 4:2.0 9:3.0\n")
    row_len, ids, vals = native.read_sparse_text(str(p))
    assert row_len.tolist() == [2, 1, 3]
    assert ids.tolist() == [1, 7, 2, 3, 4, 9]
    np.testing.assert_allclose(vals, [0.5, 1.5, 2.0, 1.0, 2.0, 3.0])


def test_read_sparse_text_id_order_rejected(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("3:1.0 2:1.0\n")
    with pytest.raises(IOError):
        native.read_sparse_text(str(p))


def test_pack_csr_roundtrip():
    row_len = np.asarray([2, 0, 3], np.int32)
    ids = np.asarray([1, 5, 2, 3, 9], np.int32)
    vals = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    col, val, length = native.pack_csr(row_len, ids, vals, n_pad=4, nnz_pad=8, pad_col=2**31 - 2)
    assert col.shape == (4, 8)
    assert col[0, :2].tolist() == [1, 5] and val[0, 1] == 2.0
    assert length.tolist() == [2, 0, 3, 0]
    assert (col[1] == 2**31 - 2).all()


def test_pack_strings():
    chars, length = native.pack_strings([b"ab", b"", b"xyz"], n_pad=4, l_max=8)
    assert chars.shape == (4, 8)
    assert chars[0, 0] == ord("a") and chars[2, 2] == ord("z")
    assert length.tolist() == [2, 0, 3, 0]


def test_native_levenshtein():
    assert native.levenshtein(b"kitten", b"sitting") == 3
    assert native.levenshtein(b"", b"abc") == 3
    assert native.levenshtein(b"same", b"same") == 0


def test_vecs_roundtrip(tmp_path):
    """fvecs/bvecs/ivecs (ANN benchmark binary format) read/write, both
    the native reader and the numpy fallback."""
    import numpy as np

    from tpu_knn.io import native as N

    rng = np.random.default_rng(0)
    x = (rng.random((50, 9)) * 10).astype(np.float32)
    for kind, arr in (
        ("fvecs", x),
        ("bvecs", (x * 20).astype(np.uint8)),
        ("ivecs", (x * 100).astype(np.int32)),
    ):
        p = str(tmp_path / f"t.{kind}")
        N.write_vecs(p, arr)
        got = N.read_vecs(p)
        np.testing.assert_array_equal(got, arr)
        # numpy fallback path must agree byte-for-byte
        lib, N._lib = N._lib, None
        orig = N.load
        N.load = lambda: None
        try:
            np.testing.assert_array_equal(N.read_vecs(p), arr)
        finally:
            N.load = orig
            N._lib = lib


def test_vecs_malformed(tmp_path):
    import numpy as np
    import pytest

    from tpu_knn.io import native as N

    p = str(tmp_path / "bad.fvecs")
    with open(p, "wb") as f:
        f.write(np.int32(3).tobytes() + b"\x00" * 7)  # truncated record
    with pytest.raises(IOError):
        N.read_vecs(p)

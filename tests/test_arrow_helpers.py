"""Ray-free unit tests for the buffer-level Arrow interop helpers."""

import numpy as np
import pyarrow as pa

from xhs_ocr_ray.functions.arrow import bytes_rows, list_matrix


def test_list_matrix_variable_list():
    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    col = pa.array(mat.tolist(), pa.list_(pa.float32()))
    got = list_matrix(col, dtype=np.float32)
    assert got.dtype == np.float32 and got.shape == (4, 3)
    assert np.array_equal(got, mat)


def test_list_matrix_fixed_size_list():
    mat = np.arange(8, dtype=np.float64).reshape(2, 4)
    col = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), pa.float64()), 4)
    got = list_matrix(col, dtype=np.float64)
    assert got.shape == (2, 4) and np.array_equal(got, mat)


def test_list_matrix_chunked_and_sliced():
    mat = np.arange(30, dtype=np.float32).reshape(10, 3)
    a = pa.array(mat[:4].tolist(), pa.list_(pa.float32()))
    b = pa.array(mat[4:].tolist(), pa.list_(pa.float32()))
    chunked = pa.chunked_array([a, b])
    assert np.array_equal(list_matrix(chunked), mat)
    sliced = pa.array(mat.tolist(), pa.list_(pa.float32())).slice(2, 5)
    assert np.array_equal(list_matrix(sliced), mat[2:7])


def test_list_matrix_empty_ragged_null_fallbacks():
    empty = pa.array([], pa.list_(pa.float32()))
    assert list_matrix(empty).shape == (0, 0)
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    try:
        list_matrix(ragged)
        raised = False
    except ValueError:
        raised = True
    assert raised  # ragged hits the slow path, which raises like np.asarray
    with_null = pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                         pa.list_(pa.float32()))
    # null-bearing columns take the slow to_pylist path (None row → error),
    # matching the previous behavior exactly
    try:
        list_matrix(with_null)
        raised = False
    except (ValueError, TypeError):
        raised = True
    assert raised


def test_bytes_rows_roundtrip():
    mat = np.arange(24, dtype=np.float64).reshape(3, 8)
    col = bytes_rows(mat)
    assert col.type == pa.binary() and len(col) == 3
    for i in range(3):
        assert np.array_equal(
            np.frombuffer(col[i].as_py(), dtype=np.float64), mat[i])
    # matches the per-row loop it replaced, byte for byte
    assert col.to_pylist() == [v.tobytes() for v in mat]
    # non-contiguous input (transpose) still serializes row-major
    t = np.arange(6, dtype=np.float32).reshape(2, 3).T
    assert bytes_rows(t).to_pylist() == [v.tobytes() for v in np.ascontiguousarray(t)]


def test_bytes_rows_empty():
    col = bytes_rows(np.empty((0, 4), dtype=np.float32))
    assert len(col) == 0 and col.type == pa.binary()

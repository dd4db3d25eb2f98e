"""Tests for the native (C++) array-bundle codec and its PlaneStore
integration."""

import os

import numpy as np
import jax
import pytest

from nvsr_tpu.utils import native_store


needs_native = pytest.mark.skipif(not native_store.available(),
                                  reason="native library unavailable")


@needs_native
def test_roundtrip_basic(tmp_path, rng):
    arrays = {
        "planes_pos": rng.standard_normal((3, 4, 16, 16)).astype(np.float32),
        "box": rng.standard_normal((2, 5)).astype(np.float32),
        "idx": np.arange(7, dtype=np.int64),
        "flag": np.array(3, dtype=np.int32),
    }
    path = str(tmp_path / "bundle.planes")
    native_store.save_arrays(path, arrays)
    assert native_store.is_nvps_file(path)
    out = native_store.load_arrays(path)
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])
        assert out[k].dtype == arrays[k].dtype


@needs_native
def test_bfloat16_roundtrip(tmp_path, rng):
    import ml_dtypes
    a = rng.standard_normal((4, 8)).astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "bf16.planes")
    native_store.save_arrays(path, {"a": a})
    out = native_store.load_arrays(path)
    np.testing.assert_array_equal(out["a"].view(np.uint16),
                                  a.view(np.uint16))


@needs_native
def test_corrupt_file_rejected(tmp_path):
    path = str(tmp_path / "bad.planes")
    with open(path, "wb") as f:
        f.write(b"SPVN" + b"\x00" * 100)  # right magic, garbage header
    with pytest.raises(IOError):
        native_store.load_arrays(path)
    with open(path, "wb") as f:
        f.write(b"nonsense")
    assert not native_store.is_nvps_file(path)


@needs_native
def test_atomic_write_no_partial(tmp_path, rng):
    path = str(tmp_path / "x.planes")
    native_store.save_arrays(path, {"a": np.ones(4, np.float32)})
    native_store.save_arrays(path, {"a": np.zeros(4, np.float32)})
    out = native_store.load_arrays(path)
    np.testing.assert_array_equal(out["a"], np.zeros(4))
    assert not os.path.exists(path + ".nvps_tmp")


@needs_native
def test_plane_store_native_backend(tmp_path):
    from nvsr_tpu.planes_store import PlaneStore, create_scene_planes

    box = np.stack([-np.ones(5), np.ones(5)]).astype(np.float32)
    p = create_scene_planes(jax.random.PRNGKey(0), num_planes=3,
                            num_channels=4, resolution=8,
                            viewdir_resolution=4, viewdir_channels=4,
                            init_std=0.05, box=box)
    store = PlaneStore(str(tmp_path), backend="native")
    path = store.save("sc", p)
    assert native_store.is_nvps_file(path)
    loaded, _ = store.load("sc")
    np.testing.assert_array_equal(np.asarray(loaded.planes_pos),
                                  np.asarray(p.planes_pos))
    # npz-backed store reads the same file transparently (magic sniff)
    store_npz = PlaneStore(str(tmp_path), backend="npz")
    loaded2, _ = store_npz.load("sc")
    np.testing.assert_array_equal(np.asarray(loaded2.planes_pos),
                                  np.asarray(p.planes_pos))
    # and native store reads npz files written by the npz backend
    store_npz.save("sc2", p)
    loaded3, _ = store.load("sc2")
    np.testing.assert_array_equal(np.asarray(loaded3.planes_pos),
                                  np.asarray(p.planes_pos))


@needs_native
def test_prefetcher(tmp_path, rng):
    paths = []
    for i in range(4):
        path = str(tmp_path / f"f{i}.bin")
        with open(path, "wb") as f:
            f.write(rng.bytes(1 << 16))
        paths.append(path)
    pf = native_store.Prefetcher(paths, n_threads=2)
    pf.join()
    assert pf.remaining() == 0

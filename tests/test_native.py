import numpy as np
import pytest

from fastliosam_tpu.io.native import (
    ScanPrefetcher,
    native_available,
    read_bin,
    read_bins,
    read_pcd_xyz,
)
from fastliosam_tpu.io.pcd import write_pcd


@pytest.fixture
def bin_files(tmp_path, rng):
    paths, refs = [], []
    for i in range(6):
        n = int(rng.integers(50, 200))
        data = rng.normal(size=(n, 4)).astype(np.float32)
        p = tmp_path / f"{i:06d}.bin"
        data.tofile(p)
        paths.append(str(p))
        refs.append(data)
    return paths, refs


def test_native_builds():
    assert native_available(), "native library failed to build"


def test_read_bin(bin_files):
    paths, refs = bin_files
    out, n = read_bin(paths[0], 256)
    assert n == len(refs[0])
    np.testing.assert_array_equal(out[:n], refs[0])
    assert np.all(out[n:, 0] == 1e6)


def test_read_bins_parallel(bin_files):
    paths, refs = bin_files
    out, counts = read_bins(paths, 256, n_threads=3)
    for i, ref in enumerate(refs):
        assert counts[i] == len(ref)
        np.testing.assert_array_equal(out[i, : len(ref)], ref)


def test_read_bins_q16_filters_and_quantizes(bin_files, tmp_path, rng):
    """The production reader path: stride/blind/max-range filtering applied
    during decode + int16 fixed-point output must match the pure-numpy
    reference semantics exactly (FAST-LIO preprocess contract,
    `kitti.yaml:1-14` — VERDICT r4 #3)."""
    from fastliosam_tpu.io.native import read_bins_q16

    n = 500
    pts = rng.uniform(-40, 40, size=(n, 4)).astype(np.float32)
    p = tmp_path / "q.bin"
    pts.tofile(p)
    scale = 1.0 / 256.0
    stride, blind, max_range = 3, 2.0, 30.0
    out, counts = read_bins_q16(
        [str(p)], 256, stride=stride, blind=blind, max_range=max_range,
        scale=scale,
    )
    # numpy reference
    ref = pts[::stride, :3]
    r2 = np.sum(ref * ref, axis=1)
    ref = ref[(r2 > blind**2) & (r2 < max_range**2)][:256]
    assert counts[0] == len(ref)
    q_ref = np.clip(np.rint(ref / scale), -32767, 32767).astype(np.int16)
    np.testing.assert_array_equal(out[0, : len(ref)], q_ref)
    assert np.all(out[0, len(ref):] == 0)
    # round-trip error bounded by half a quantization step
    dec = out[0, : len(ref)].astype(np.float32) * scale
    assert np.abs(dec - ref).max() <= 0.5 * scale + 1e-6


def test_prefetcher_order(bin_files):
    paths, refs = bin_files
    pf = ScanPrefetcher(paths, capacity=256, depth=2)
    got = list(pf)
    pf.close()
    assert len(got) == len(refs)
    for (out, n), ref in zip(got, refs):
        assert n == len(ref)
        np.testing.assert_array_equal(out[:n], ref)


def test_read_pcd_xyz_fast_path(tmp_path, rng):
    cloud = np.zeros(
        100, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4")]
    )
    cloud["x"] = rng.normal(size=100)
    cloud["y"] = rng.normal(size=100)
    cloud["z"] = rng.normal(size=100)
    p = str(tmp_path / "c.pcd")
    write_pcd(p, cloud, binary=True)
    out, n = read_pcd_xyz(p, 128)
    assert n == 100
    np.testing.assert_allclose(out[:100, 0], cloud["x"], atol=1e-6)
    np.testing.assert_allclose(out[:100, 2], cloud["z"], atol=1e-6)

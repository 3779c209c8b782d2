"""PCD v0.7 codec: read/write ascii + binary, preserving all fields.

Capability equivalent of the manual PCD parsing in the reference's
post-processing tools (`post_process/merge_pcds.py:6-120`,
`georeference_pcd.py:28-51`) and of the PCL-based map export
(`fast_lio_sam.cpp:929-935`). Structured numpy arrays carry arbitrary
fields (x, y, z, intensity, rgb, ...) unchanged through transforms.
"""
from __future__ import annotations

import numpy as np

_PCD_TO_NP = {
    ("F", 4): "f4",
    ("F", 8): "f8",
    ("I", 1): "i1",
    ("I", 2): "i2",
    ("I", 4): "i4",
    ("U", 1): "u1",
    ("U", 2): "u2",
    ("U", 4): "u4",
}
_NP_TO_PCD = {v: k for k, v in _PCD_TO_NP.items()}


def read_pcd(path: str) -> np.ndarray:
    """Read a PCD file into a structured numpy array (one entry per field)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, rest = line.partition(" ")
            header[key.upper()] = rest.split()
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n_pts = int(header["POINTS"][0])
        mode = header["DATA"][0].lower()

        np_fields = []
        for name, t, s, c in zip(fields, types, sizes, counts):
            base = _PCD_TO_NP[(t, s)]
            if c == 1:
                np_fields.append((name, base))
            else:
                np_fields.append((name, base, (c,)))
        dtype = np.dtype(np_fields)

        if mode == "binary":
            buf = f.read(n_pts * dtype.itemsize)
            return np.frombuffer(buf, dtype=dtype, count=n_pts).copy()
        if mode == "ascii":
            raw = np.loadtxt(f, max_rows=n_pts, ndmin=2)
            out = np.zeros(n_pts, dtype=dtype)
            col = 0
            for name, t, s, c in zip(fields, types, sizes, counts):
                if c == 1:
                    out[name] = raw[:, col].astype(out[name].dtype)
                else:
                    out[name] = raw[:, col : col + c].astype(out[name].dtype)
                col += c
            return out
        if mode == "binary_compressed":
            import lzf  # pragma: no cover — not in this image

            raise NotImplementedError("binary_compressed PCD not supported")
        raise ValueError(f"unknown PCD DATA mode: {mode}")


def write_pcd(path: str, cloud: np.ndarray, binary: bool = True) -> None:
    """Write a structured array (or plain (N,3) float array) as PCD."""
    if cloud.dtype.names is None:
        arr = np.zeros(
            len(cloud), dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")]
        )
        arr["x"], arr["y"], arr["z"] = (
            cloud[:, 0],
            cloud[:, 1],
            cloud[:, 2],
        )
        cloud = arr
    names = cloud.dtype.names
    sizes, types, counts = [], [], []
    for name in names:
        dt, shape = cloud.dtype.fields[name][0], cloud.dtype.fields[name][0].shape
        base = dt.base
        t, s = _NP_TO_PCD[base.str[1:]]
        c = int(np.prod(dt.shape)) if dt.shape else 1
        types.append(t)
        sizes.append(str(s))
        counts.append(str(c))
    n = len(cloud)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {' '.join(names)}\n"
        f"SIZE {' '.join(sizes)}\n"
        f"TYPE {' '.join(types)}\n"
        f"COUNT {' '.join(counts)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(cloud.tobytes())
        else:
            cols = []
            for name in names:
                v = cloud[name]
                cols.append(v.reshape(n, -1))
            np.savetxt(f, np.hstack(cols), fmt="%.6f")


def xyz_of(cloud: np.ndarray) -> np.ndarray:
    """Extract an (N, 3) float view of a structured cloud."""
    return np.column_stack(
        [cloud["x"].astype(np.float64), cloud["y"].astype(np.float64),
         cloud["z"].astype(np.float64)]
    )


def with_xyz(cloud: np.ndarray, xyz: np.ndarray) -> np.ndarray:
    """Return a copy with x/y/z replaced (all other fields preserved) —
    the `georeference_pcd.py` / `transform_pcd.py` capability."""
    out = cloud.copy()
    out["x"] = xyz[:, 0].astype(out["x"].dtype)
    out["y"] = xyz[:, 1].astype(out["y"].dtype)
    out["z"] = xyz[:, 2].astype(out["z"].dtype)
    return out

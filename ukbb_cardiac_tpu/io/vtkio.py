"""Legacy-VTK polydata I/O (pure numpy).

The reference uses the `vtk` C++ wrapper to write myocardial contours,
landmarks and thickness maps as legacy ``.vtk`` polydata
(``common/cardiac_utils.py:462-536,645-750``).  vtk is not a dependency
here; the legacy ASCII format is a simple text container, so we implement
the subset the pipeline uses: POINTS, LINES, POINT_DATA / CELL_DATA with
SCALARS and VECTORS arrays.

Files are written as "# vtk DataFile Version 4.0" — the version MIRTK
compatibility forced the reference to sed-patch into its outputs
(``cardiac_utils.py:1392``); we emit it natively.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np


@dataclass
class PolyData:
    """Minimal polydata: 3D points, polyline cells, named data arrays."""

    points: np.ndarray  # (N, 3) float
    lines: List[np.ndarray] = field(default_factory=list)  # each an index array
    point_scalars: Dict[str, np.ndarray] = field(default_factory=dict)
    point_vectors: Dict[str, np.ndarray] = field(default_factory=dict)
    cell_scalars: Dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def n_points(self) -> int:
        return int(self.points.shape[0])

    @property
    def n_cells(self) -> int:
        return len(self.lines)


def _fmt_scalar_block(name: str, data: np.ndarray) -> List[str]:
    data = np.asarray(data)
    if np.issubdtype(data.dtype, np.integer):
        typ, fmt = "int", "{:d}"
    else:
        typ, fmt = "float", "{:.6f}"
    out = [f"SCALARS {name} {typ}", "LOOKUP_TABLE default"]
    out += [fmt.format(v) for v in data.tolist()]
    return out


def save_polydata(pd: PolyData, path: str, title: str = "ukbb_cardiac_tpu") -> None:
    lines_out = [
        "# vtk DataFile Version 4.0",
        title,
        "ASCII",
        "DATASET POLYDATA",
        f"POINTS {pd.n_points} float",
    ]
    for p in np.asarray(pd.points, dtype=float):
        lines_out.append(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    if pd.lines:
        total = sum(len(l) + 1 for l in pd.lines)
        lines_out.append(f"LINES {len(pd.lines)} {total}")
        for l in pd.lines:
            lines_out.append(" ".join(str(int(i)) for i in [len(l)] + list(l)))
    if pd.point_scalars or pd.point_vectors:
        lines_out.append(f"POINT_DATA {pd.n_points}")
        for name, data in pd.point_scalars.items():
            lines_out += _fmt_scalar_block(name, data)
        for name, data in pd.point_vectors.items():
            lines_out.append(f"VECTORS {name} float")
            for v in np.asarray(data, dtype=float):
                lines_out.append(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    if pd.cell_scalars:
        lines_out.append(f"CELL_DATA {pd.n_cells}")
        for name, data in pd.cell_scalars.items():
            lines_out += _fmt_scalar_block(name, data)
    with open(path, "w") as f:
        f.write("\n".join(lines_out) + "\n")


def load_polydata(path: str) -> PolyData:
    with open(path) as f:
        tokens_by_line = [ln.strip() for ln in f]
    i = 0

    def next_line():
        nonlocal i
        while i < len(tokens_by_line) and not tokens_by_line[i]:
            i += 1
        if i >= len(tokens_by_line):
            return None
        ln = tokens_by_line[i]
        i += 1
        return ln

    def read_numbers(n, dtype=float):
        """Read n whitespace-separated numbers spanning multiple lines."""
        vals: List = []
        while len(vals) < n:
            ln = next_line()
            if ln is None:
                raise ValueError(f"unexpected EOF in {path}")
            vals.extend(dtype(t) for t in ln.split())
        return vals

    pd = PolyData(points=np.zeros((0, 3)))
    n_points = 0
    section = None
    while True:
        ln = next_line()
        if ln is None:
            break
        up = ln.upper()
        if up.startswith("#") or up in ("ASCII", "BINARY") or up.startswith("DATASET"):
            continue
        parts = ln.split()
        key = parts[0].upper()
        if key == "POINTS":
            n_points = int(parts[1])
            vals = read_numbers(n_points * 3)
            pd.points = np.asarray(vals, dtype=float).reshape(n_points, 3)
        elif key in ("LINES", "POLYGONS"):
            n_cells, total = int(parts[1]), int(parts[2])
            vals = read_numbers(total, int)
            j = 0
            for _ in range(n_cells):
                m = vals[j]
                pd.lines.append(np.asarray(vals[j + 1:j + 1 + m], dtype=int))
                j += 1 + m
        elif key == "POINT_DATA":
            section = ("point", int(parts[1]))
        elif key == "CELL_DATA":
            section = ("cell", int(parts[1]))
        elif key == "SCALARS":
            name = parts[1]
            is_int = parts[2].lower() in ("int", "long", "short", "char")
            kind, n = section
            # optional LOOKUP_TABLE line
            ln2 = next_line()
            if ln2 is not None and not ln2.upper().startswith("LOOKUP_TABLE"):
                i -= 1
            vals = read_numbers(n, int if is_int else float)
            arr = np.asarray(vals)
            if kind == "point":
                pd.point_scalars[name] = arr
            else:
                pd.cell_scalars[name] = arr
        elif key == "VECTORS":
            name = parts[1]
            kind, n = section
            vals = read_numbers(n * 3)
            pd.point_vectors[name] = np.asarray(vals).reshape(n, 3)
        elif key == "FIELD":
            # skip FIELD blocks (name, numArrays); read each array header + data
            n_arrays = int(parts[2])
            for _ in range(n_arrays):
                hdr = next_line().split()
                n_comp, n_tuples = int(hdr[1]), int(hdr[2])
                read_numbers(n_comp * n_tuples)
    return pd


def append_polydata(pds: List[PolyData]) -> PolyData:
    """Merge polydata blocks, offsetting cell indices — the
    ``vtkAppendPolyData`` equivalent (``cardiac_utils.py:969-984``)."""
    pds = [p for p in pds if p.n_points > 0]
    if not pds:
        return PolyData(points=np.zeros((0, 3)))
    points = np.concatenate([p.points for p in pds], axis=0)
    out = PolyData(points=points)
    offset = 0
    for p in pds:
        for l in p.lines:
            out.lines.append(np.asarray(l) + offset)
        offset += p.n_points
    for name in pds[0].point_scalars:
        if all(name in p.point_scalars for p in pds):
            out.point_scalars[name] = np.concatenate(
                [p.point_scalars[name] for p in pds])
    for name in pds[0].point_vectors:
        if all(name in p.point_vectors for p in pds):
            out.point_vectors[name] = np.concatenate(
                [p.point_vectors[name] for p in pds], axis=0)
    for name in pds[0].cell_scalars:
        if all(name in p.cell_scalars for p in pds):
            out.cell_scalars[name] = np.concatenate(
                [p.cell_scalars[name] for p in pds])
    return out

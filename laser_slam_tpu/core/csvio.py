"""CSV helpers mirroring the reference's free functions
(laser_slam/include/laser_slam/common.hpp:155-230): ``writeCSV``,
``loadCSV``, ``writeEigenMatrixXdCSV``, ``loadEigenMatrixXdCSV`` and the
(time -> value) map conversion ``toEigenMatrixXd`` (common.hpp:232-242)."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def write_csv(rows: Sequence[Sequence[str]], path: str) -> None:
    """Write a matrix of strings as comma-separated rows
    (writeCSV, common.hpp:155-170)."""
    assert len(rows) >= 1, 'Provided matrix of strings had no entries.'
    with open(path, 'w') as f:
        for row in rows:
            assert len(row) >= 1, 'String matrix row has no entries.'
            f.write(','.join(str(x) for x in row) + '\n')


def load_csv(path: str) -> List[List[str]]:
    """Read a CSV into a matrix of strings (loadCSV, common.hpp:189-208)."""
    out = []
    with open(path) as f:
        for line in f:
            out.append(line.rstrip('\n').split(','))
    return out


def write_matrix_csv(matrix: np.ndarray, path: str) -> None:
    """(writeEigenMatrixXdCSV, common.hpp:173-186)."""
    np.savetxt(path, np.atleast_2d(np.asarray(matrix)), delimiter=',',
               fmt='%.9g')


def load_matrix_csv(path: str) -> np.ndarray:
    """(loadEigenMatrixXdCSV, common.hpp:211-230)."""
    return np.atleast_2d(np.loadtxt(path, delimiter=',', dtype=np.float64))


def time_value_map_to_matrix(values: Dict[int, float]) -> np.ndarray:
    """{time: value} -> [N,2] matrix (toEigenMatrixXd, common.hpp:232-242)."""
    out = np.zeros((len(values), 2))
    for i, (t, v) in enumerate(sorted(values.items())):
        out[i] = (t, v)
    return out

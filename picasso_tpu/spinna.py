"""picasso_tpu.spinna — SPINNA: simulate labeled structure mixtures,
compare nearest-neighbor-distance (NND) histograms with experiment, fit
stoichiometries (Nat. Methods / Nat. Comms 2025).

Capability parity with picasso/spinna.py (rref :48,
generate_N_structures :203, random_rotation_matrices :397,
coords_to_locs :441, get_NN_dist* :696-845, NND_score :846,
load_structures :876, MaskGenerator :920, Structure :1313,
StructureSimulator :1518, StructureMixer :2161, SPINNA :3037 with
coarse-to-fine :3322 / bayesian :3441 / brute-force :3740 / bootstrap
:3786, compare_models :4181, fit_le :4534).

All simulation/placement math runs as vectorized numpy batches over
whole structure populations; candidate scoring runs in a simple loop
(each candidate is an independent simulation — no process pool
required).
"""

from __future__ import annotations

import os
from copy import deepcopy
from itertools import product as it_prod
from typing import Literal

import numpy as np
import pandas as pd
from scipy.spatial import cKDTree as KDTree
from scipy.spatial.transform import Rotation
from scipy.stats import ks_2samp

from picasso_tpu import __version__, io, lib

N_TASKS = 100
N_BOOTSTRAPS = 20
BOOTSTRAP_DISTANCE = 30.0
# Minkowski power for the bootstrap-subset distance (reference
# spinna.py:45: p=1, Manhattan)
BOOTSTRAP_DISTANCE_METRIC = 1.0


# ---------------------------------------------------------------------------
# Linear algebra for the search space (picasso/spinna.py:48-202)
# ---------------------------------------------------------------------------


def rref(M: np.ndarray) -> np.ndarray:
    """Reduced row echelon form by Gaussian elimination."""
    M = np.array(M, dtype=np.float64, copy=True)
    lead = 0
    n_rows, n_cols = M.shape
    for r in range(n_rows):
        if n_cols <= lead:
            break
        i = r
        while M[i, lead] == 0:
            i += 1
            if n_rows == i:
                i = r
                lead += 1
                if n_cols == lead:
                    break
        if n_cols == lead:
            break
        M[[r, i], :] = M[[i, r], :]
        if M[r, lead] != 0:
            M[r, :] = M[r, :] / M[r, lead]
        for i in range(n_rows):
            if i != r:
                M[i, :] -= M[i, lead] * M[r, :]
        lead += 1
    return M


def _targets_from_structures(structures) -> list[str]:
    targets = []
    for s in structures:
        for t in s.targets:
            if t not in targets:
                targets.append(t)
    return targets


def _find_target_counts(targets, structures) -> np.ndarray:
    t_counts = np.zeros((len(targets), len(structures)), np.float32)
    for i, s in enumerate(structures):
        t_counts[:, i] = s.get_ind_target_count(targets)
    return t_counts


def targets_from_structures(structures) -> list[str]:
    """Deprecated public shim (picasso/spinna.py:184)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _targets_from_structures instead."
    )
    return _targets_from_structures(structures)


def find_target_counts(targets, structures) -> np.ndarray:
    """Deprecated public shim (picasso/spinna.py:95)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _find_target_counts instead."
    )
    return _find_target_counts(targets, structures)


def get_structures_permutation(t_counts: np.ndarray) -> np.ndarray:
    """Deprecated public shim (picasso/spinna.py:134)."""
    lib.deprecation_warning(
        "Deprecation warning: This function will become private in "
        "v0.11.0. Use _get_structures_permutation instead."
    )
    return _get_structures_permutation(t_counts)


def _get_structures_permutation(t_counts: np.ndarray) -> np.ndarray:
    """Order structures so that the free parameters of the linear
    system sit on the right (picasso/spinna.py:143)."""
    n_t, n_s = t_counts.shape
    perm = np.arange(n_s)
    red = rref(t_counts)
    lpc = n_t
    for i in range(min(n_t, n_s)):
        if lpc >= n_s:
            break
        if red[i, i] != 1:
            perm[i], perm[lpc] = lpc, i
            lpc += 1
    return perm


def generate_N_structures(
    structures, N_total: dict, granularity: int, save: str = ""
) -> dict:
    """Generate the stoichiometry search space: all non-negative
    integer structure counts consistent with the total target counts,
    gridded at the given granularity (picasso/spinna.py:203)."""
    targets = _targets_from_structures(structures)
    n_t = len(targets)
    n_s = len(structures)
    if n_s < n_t:
        raise ValueError(
            "Search-space generation needs at least as many candidate"
            " structures as unique molecular targets; got"
            f" {n_s} structure(s) for {n_t} target(s)."
        )
    t_counts = _find_target_counts(targets, structures)
    if n_s == n_t:
        N_arr = np.asarray(
            [N_total[t] for t in targets], np.float64
        )
        try:
            counts = np.linalg.solve(
                t_counts.astype(np.float64), N_arr
            )
        except np.linalg.LinAlgError as err:
            raise ValueError(
                "Cannot generate a search space: t_counts is singular."
            ) from err
        counts = np.maximum(np.round(counts), 0).astype(np.int32)
        out = {
            s.title: np.array([counts[i]])
            for i, s in enumerate(structures)
        }
        if save:
            pd.DataFrame(out).to_csv(save, index=False)
        return out

    p = _get_structures_permutation(t_counts.copy())
    t_counts = t_counts[:, p]
    structures = [structures[i] for i in p]
    N_arr = np.asarray([N_total[t] for t in targets])
    eqs = np.float32(
        rref(np.hstack((t_counts, N_arr.reshape(-1, 1))))
    )
    t_free = t_counts[:, n_t:]
    max_vals = N_arr.max() * np.ones_like(t_free)
    np.divide(
        N_arr.reshape(-1, 1), t_free, out=max_vals,
        where=t_free != 0,
    )
    max_vals = max_vals.min(axis=0).astype(np.int32)
    bases = [np.linspace(0, m, granularity) for m in max_vals]
    free = np.array(list(it_prod(*bases)))
    N_structures = np.hstack(
        (np.zeros((free.shape[0], n_t)), free)
    )
    for i in range(n_t):
        formula = eqs[n_t - i - 1][(n_t - i):]
        N_structures[:, n_t - i - 1] = formula[-1] - (
            N_structures[:, (n_t - i):] @ formula[:-1]
        )
    mask = np.any(N_structures < 0, axis=1)
    N_structures = N_structures[~mask].astype(np.int32)
    out = {
        s.title: N_structures[:, i]
        for i, s in enumerate(structures)
    }
    if save:
        pd.DataFrame(out).to_csv(save, index=False)
    return out


# ---------------------------------------------------------------------------
# Rotations / conversions (picasso/spinna.py:397-498)
# ---------------------------------------------------------------------------


def random_rotation_matrices(
    N: int, mode: Literal["2D", "3D"] | None = "2D"
) -> np.ndarray:
    """N random rigid-body rotation matrices: in-plane for 2D, uniform
    SO(3) for 3D, identity for None (picasso/spinna.py:397)."""
    if mode is None:
        return np.tile(np.eye(3), (N, 1, 1))
    if mode == "2D":
        ang = np.random.uniform(0, 2 * np.pi, N)
        c, s = np.cos(ang), np.sin(ang)
        R = np.zeros((N, 3, 3))
        R[:, 0, 0] = c
        R[:, 0, 1] = -s
        R[:, 1, 0] = s
        R[:, 1, 1] = c
        R[:, 2, 2] = 1.0
        return R
    if mode == "3D":
        return Rotation.random(N).as_matrix()
    raise ValueError("mode must be '2D', '3D' or None.")


def coords_to_locs(
    coords: np.ndarray, lp: float = 1.0, pixelsize: float = 130
) -> pd.DataFrame:
    """nm coordinates -> locs DataFrame (x/y in camera px, z in nm;
    picasso/spinna.py:441)."""
    x = (coords[:, 0] / pixelsize).astype(np.float32)
    y = (coords[:, 1] / pixelsize).astype(np.float32)
    lpx = (lp * np.ones(len(x)) / pixelsize).astype(np.float32)
    frame = np.ones(len(x), dtype=np.uint32)
    data = {"frame": frame, "x": x, "y": y}
    if coords.shape[1] == 3:
        data["z"] = coords[:, 2].astype(np.float32)
    data["lpx"] = lpx
    data["lpy"] = lpx
    return pd.DataFrame(data)


# ---------------------------------------------------------------------------
# NND machinery (picasso/spinna.py:696-875)
# ---------------------------------------------------------------------------


def get_NN_dist(data1, data2, n_neighbors: int) -> np.ndarray:
    """K nearest-neighbor distances, shape (len(data1), n_neighbors),
    columns ascending. Querying a point cloud against itself drops the
    zero-distance self match so column 0 is the true nearest
    neighbor. Behavioral contract: picasso/spinna.py:696-749."""
    n_from = len(data1)
    if not (n_from and len(data2)):
        return np.array([])
    if data1.shape[1] != data2.shape[1]:
        raise ValueError(
            f"dimensionality mismatch: data1 has {data1.shape[1]} "
            f"columns, data2 has {data2.shape[1]}"
        )
    self_query = data1.shape == data2.shape and bool(
        np.array_equal(data1, data2)
    )
    k = n_neighbors + 1 if self_query else n_neighbors
    # KDTree.query squeezes the neighbor axis when k == 1; reshape
    # restores the documented 2D contract in one step
    dist = KDTree(data2).query(data1, k=k)[0].reshape(n_from, k)
    return dist[:, 1:] if self_query else dist


def get_NN_dist_experimental(
    coords: dict, mixer: "StructureMixer", duplicate: bool = False
) -> list[np.ndarray]:
    """Experimental NNDs for every relevant target pair
    (picasso/spinna.py:750)."""
    neighbor_idx = mixer.get_neighbor_idx(duplicate=duplicate)
    dists = []
    for t1, t2, n in neighbor_idx:
        if n:
            dists.append(get_NN_dist(coords[t1], coords[t2], n))
    return dists


def get_NN_dist_simulated(
    N_str, N_sim: int, mixer: "StructureMixer",
    duplicate: bool = False,
) -> list[np.ndarray]:
    """Simulated NNDs pooled over N_sim repeats
    (picasso/spinna.py:792)."""
    neighbor_idx = mixer.get_neighbor_idx(duplicate=duplicate)
    acc = [[] for (_, _, n) in neighbor_idx if n]
    for _ in range(N_sim):
        coords = mixer.run_simulation(N_str)
        i = 0
        for t1, t2, n in neighbor_idx:
            if n:
                acc[i].append(
                    get_NN_dist(coords[t1], coords[t2], n)
                )
                i += 1
    return [np.concatenate(a) if a else np.array([]) for a in acc]


def NND_score(dists1, dists2) -> float:
    """Mean 2-sample KS statistic across target pairs and neighbor
    orders (picasso/spinna.py:846)."""
    scores = []
    for d1, d2 in zip(dists1, dists2):
        if len(d1) == 0 or len(d2) == 0:
            continue
        for n in range(d1.shape[1]):
            scores.append(ks_2samp(d1[:, n], d2[:, n]).statistic)
    if not scores:
        return 1.0
    return float(np.mean(scores))


# ---------------------------------------------------------------------------
# Structure (picasso/spinna.py:1313)
# ---------------------------------------------------------------------------


class Structure:
    """A hetero/homo-multimer: named molecular targets with nm
    coordinates."""

    def __init__(self, title: str) -> None:
        self.title = title
        self.targets: list[str] = []
        self.x: dict = {}
        self.y: dict = {}
        self.z: dict = {}

    def __repr__(self) -> str:
        lines = [
            f"Type: Structure, Title: {self.title}\n"
            "Coordinates below: x, y, z (nm)\n"
        ]
        for target in self.x:
            lines.append(f"{target}:")
            for x, y, z in zip(
                self.x[target], self.y[target], self.z[target]
            ):
                lines.append(f"{x}, {y}, {z}")
        return "\n".join(lines) + "\n"

    def define_coordinates(self, target, x, y, z=None) -> "Structure":
        if z is not None:
            if not (len(x) == len(y) == len(z)):
                raise ValueError(
                    "x, y and z coordinates must have equal length."
                )
        else:
            if len(x) != len(y):
                raise ValueError(
                    "x and y coordinates must have equal length."
                )
            z = [0] * len(x)
        if target not in self.targets:
            self.targets.append(target)
            self.x[target] = list(x)
            self.y[target] = list(y)
            self.z[target] = list(z)
        else:
            self.x[target].extend(x)
            self.y[target].extend(y)
            self.z[target].extend(z)
        return self

    def delete_target(self, target: str) -> None:
        if target in self.targets:
            self.targets.remove(target)
            del self.x[target]
            del self.y[target]
            del self.z[target]

    def get_all_targets_count(self) -> int:
        return sum(len(c) for c in self.x.values())

    def get_ind_target_count(self, targets) -> list[int]:
        return [
            len(self.x[t]) if t in self.targets else 0
            for t in targets
        ]

    def get_max_nn(self, target1: str, target2: str) -> int:
        if target1 not in self.targets or target2 not in self.targets:
            return 0
        if target1 == target2:
            return max(len(self.x[target1]) - 1, 0)
        return min(len(self.x[target1]), len(self.x[target2]))

    def get_info(self) -> dict:
        info = {
            "Structure title": self.title,
            "Molecular targets": self.targets,
        }
        for t in self.targets:
            info[f"{t}_x"] = list(self.x[t])
            info[f"{t}_y"] = list(self.y[t])
            info[f"{t}_z"] = list(self.z[t])
        return info

    def restart(self) -> "Structure":
        self.targets = []
        self.x = {}
        self.y = {}
        self.z = {}
        return self

    def save(self, path: str) -> None:
        if not path.endswith(".yaml"):
            raise ValueError(
                "Path for saving structure must end with .yaml"
            )
        io.save_info(path, [self.get_info()])


def load_structures(path: str) -> tuple[list[Structure], list[str]]:
    """Load structures from a YAML multi-document file
    (picasso/spinna.py:876)."""
    info = io.load_info(path)
    structures = []
    for block in info:
        s = Structure(block["Structure title"])
        for t in block["Molecular targets"]:
            s.define_coordinates(
                t,
                block[f"{t}_x"],
                block[f"{t}_y"],
                block.get(f"{t}_z"),
            )
        structures.append(s)
    return structures, _targets_from_structures(structures)


# ---------------------------------------------------------------------------
# MaskGenerator (picasso/spinna.py:920)
# ---------------------------------------------------------------------------


class MaskGenerator:
    """Blurred 2D/3D density masks from localizations, used to place
    simulated structures with experiment-like spatial density."""

    def __init__(
        self,
        locs: pd.DataFrame,
        info: list[dict],
        binsize: float = 100.0,
        sigma: float = 200.0,
        mode: Literal["2D", "3D"] = "2D",
    ):
        self.locs = locs
        self.info = info
        self.mode = mode
        self.pixelsize = lib.get_from_metadata(
            info, "Pixelsize", default=130
        )
        self.mask = None
        self.set_binsize(binsize)
        self.set_sigma(sigma)

    def set_binsize(self, binsize) -> None:
        self.binsize = binsize  # nm

    def set_sigma(self, sigma) -> None:
        self.sigma = sigma  # nm

    def render_locs(self) -> np.ndarray:
        width = lib.get_from_metadata(self.info, "Width")
        height = lib.get_from_metadata(self.info, "Height")
        bin_px = self.binsize / self.pixelsize
        nx = int(np.ceil(width / bin_px))
        ny = int(np.ceil(height / bin_px))
        x = self.locs["x"].to_numpy() / bin_px
        y = self.locs["y"].to_numpy() / bin_px
        if self.mode == "3D" and "z" in self.locs.columns:
            z = self.locs["z"].to_numpy() / self.binsize
            z = z - z.min()
            nz = max(1, int(np.ceil(z.max())) + 1)
            img, _ = np.histogramdd(
                np.column_stack([y, x, z]),
                bins=(ny, nx, nz),
                range=((0, ny), (0, nx), (0, nz)),
            )
        else:
            img, _, _ = np.histogram2d(
                y, x, bins=(ny, nx), range=((0, ny), (0, nx))
            )
        return img

    def generate_mask(self, thresholded: bool = False) -> np.ndarray:
        from scipy.ndimage import gaussian_filter

        img = self.render_locs()
        sigma_bins = self.sigma / self.binsize
        mask = gaussian_filter(img.astype(np.float64), sigma_bins)
        if thresholded:
            from picasso_tpu import masking as _masking

            thresh = _masking.threshold_otsu(mask)
            mask = (mask > thresh).astype(np.float64)
        if mask.sum() > 0:
            mask = mask / mask.sum()
        self.mask = mask
        return mask

    def save_mask(self, path: str, save_png: bool = False) -> None:
        if self.mask is None:
            raise ValueError("Generate the mask first.")
        np.save(path, self.mask)
        base = path[:-4] if path.endswith(".npy") else path
        self.save_mask_info(base + ".yaml")

    def save_mask_info(self, path: str) -> None:
        io.save_info(path, [self.mask_info()])

    def mask_info(self) -> dict:
        return {
            "Generated by": f"Picasso v{__version__} SPINNA Mask",
            "Binsize (nm)": self.binsize,
            "Sigma (nm)": self.sigma,
            "Mode": self.mode,
            "Shape": (
                list(self.mask.shape) if self.mask is not None else None
            ),
        }

    @property
    def area(self) -> float | None:
        """Mask area (um^2) of nonzero bins (2D)."""
        if self.mask is None or self.mask.ndim != 2:
            return None
        return float(
            (self.mask > 0).sum() * (self.binsize / 1000) ** 2
        )

    @property
    def volume(self) -> float | None:
        """Mask volume (um^3) of nonzero bins (3D)."""
        if self.mask is None or self.mask.ndim != 3:
            return None
        return float(
            (self.mask > 0).sum() * (self.binsize / 1000) ** 3
        )


# ---------------------------------------------------------------------------
# StructureSimulator (picasso/spinna.py:1518)
# ---------------------------------------------------------------------------


class StructureSimulator:
    """Simulate one structure population: random center placement (CSR
    in the ROI or multinomial over a density mask), random rigid-body
    rotation per structure, label-uncertainty jitter and labeling
    efficiency thinning — all as vectorized batch operations."""

    def __init__(
        self,
        structure: Structure,
        N_structures: int,
        le,
        label_unc,
        mask=None,
        mask_info: dict | None = None,
        width: float | None = None,
        height: float | None = None,
        depth: float | None = None,
        random_rot_mode: Literal["2D", "3D"] | None = "2D",
    ):
        self.structure = structure
        self.N = int(N_structures)
        self.le = (
            le if isinstance(le, (list, np.ndarray))
            else [le] * len(structure.targets)
        )
        self.label_unc = (
            label_unc
            if isinstance(label_unc, (list, np.ndarray))
            else [label_unc] * len(structure.targets)
        )
        self.mask = mask
        self.mask_info = mask_info or {}
        self.width = width
        self.height = height
        self.depth = depth
        self.random_rot_mode = random_rot_mode
        self.c_pos = None
        self.pos: dict = {}
        self.pos_obs: dict = {}

    # -- centers --
    def simulate_centers(self) -> None:
        if self.mask is not None:
            self.simulate_centers_mask()
        else:
            self.simulate_centers_CSR()

    def simulate_centers_CSR(self) -> None:
        if self.width is None or self.height is None:
            raise ValueError(
                "width and height (nm) must be given for CSR"
                " simulation."
            )
        x = np.random.uniform(0, self.width, self.N)
        y = np.random.uniform(0, self.height, self.N)
        if self.depth is not None:
            z = np.random.uniform(
                -self.depth / 2, self.depth / 2, self.N
            )
            self.c_pos = np.column_stack([x, y, z])
        else:
            self.c_pos = np.column_stack(
                [x, y, np.zeros(self.N)]
            )

    def simulate_centers_mask(self) -> None:
        """Multinomial draw over mask bins, then CSR within each bin
        (picasso/spinna.py:1742)."""
        mask = np.asarray(self.mask, np.float64)
        p = mask.ravel() / mask.sum()
        counts = np.random.multinomial(self.N, p)
        binsize = self.mask_info.get("Binsize (nm)", 100.0)
        idx = np.repeat(np.arange(mask.size), counts)
        if mask.ndim == 2:
            by, bx = np.unravel_index(idx, mask.shape)
            x = (bx + np.random.random(self.N)) * binsize
            y = (by + np.random.random(self.N)) * binsize
            self.c_pos = np.column_stack(
                [x, y, np.zeros(self.N)]
            )
        else:
            by, bx, bz = np.unravel_index(idx, mask.shape)
            x = (bx + np.random.random(self.N)) * binsize
            y = (by + np.random.random(self.N)) * binsize
            z = (bz + np.random.random(self.N)) * binsize
            self.c_pos = np.column_stack([x, y, z])

    # -- targets --
    def simulate_all_targets(self) -> None:
        """Place all targets of all structure copies: tile template
        coords, rotate each copy, offset by centers, add Gaussian
        label-uncertainty jitter (picasso/spinna.py:1828)."""
        self.pos = {}
        if self.N == 0:
            for t in self.structure.targets:
                dim = 3 if self.depth is not None or (
                    self.mask is not None and np.ndim(self.mask) == 3
                ) else 2
                self.pos[t] = np.zeros((0, dim))
            return
        rotations = random_rotation_matrices(
            self.N, self.random_rot_mode
        )
        is_3d = self.depth is not None or (
            self.mask is not None and np.ndim(self.mask) == 3
        )
        for i, t in enumerate(self.structure.targets):
            template = np.stack(
                (
                    self.structure.x[t],
                    self.structure.y[t],
                    self.structure.z[t],
                )
            ).astype(np.float64).T  # (M, 3)
            M = len(template)
            # (N, M, 3) rotated copies
            coords = np.einsum(
                "nij,mj->nmi", rotations, template
            )
            coords = coords + self.c_pos[:, None, :]
            unc = self.label_unc[i]
            coords = coords + np.random.normal(
                0, max(unc, 1e-12), coords.shape
            )
            flat = coords.reshape(-1, 3)
            self.pos[t] = flat if is_3d else flat[:, :2]

    def simulate_le(self) -> None:
        """Thin each target population by its labeling efficiency
        (picasso/spinna.py:1946)."""
        self.pos_obs = {}
        for i, t in enumerate(self.pos):
            N = len(self.pos[t])
            keep = np.random.choice(
                N, size=int(N * self.le[i]), replace=False
            )
            self.pos_obs[t] = self.pos[t][keep, :]

    def run(
        self,
        save_centers: bool = False,
        save_all_mol: bool = False,
        save_obs_mol: bool = False,
        path_base: str | None = None,
    ) -> "StructureSimulator":
        self.simulate_centers()
        self.simulate_all_targets()
        self.simulate_le()
        if any([save_centers, save_all_mol, save_obs_mol]):
            if path_base is None:
                raise ValueError(
                    "Please specify path_base for saving."
                )
            self.save(
                path_base, save_centers, save_all_mol, save_obs_mol
            )
        return self

    def save(self, path_base, centers=False, all_mol=False,
             obs_mol=False):
        info = [{
            "Generated by": f"Picasso v{__version__} SPINNA simulate",
            "Structure": self.structure.title,
            "N structures": self.N,
        }]
        if centers and self.c_pos is not None:
            io.save_locs(
                path_base + "_centers.hdf5",
                coords_to_locs(self.c_pos[:, :2]),
                info,
            )
        for t in self.structure.targets:
            if all_mol and t in self.pos:
                io.save_locs(
                    path_base + f"_all_{t}.hdf5",
                    coords_to_locs(self.pos[t]),
                    info,
                )
            if obs_mol and t in self.pos_obs:
                io.save_locs(
                    path_base + f"_obs_{t}.hdf5",
                    coords_to_locs(self.pos_obs[t]),
                    info,
                )


# ---------------------------------------------------------------------------
# StructureMixer (picasso/spinna.py:2161)
# ---------------------------------------------------------------------------


class StructureMixer:
    """Multi-structure, multi-target simulation with NND bookkeeping."""

    def __init__(
        self,
        structures,
        label_unc: dict,
        le: dict,
        mask_dict: dict | None = None,
        width: float | None = None,
        height: float | None = None,
        depth: float | None = None,
        random_rot_mode: Literal["2D", "3D"] | None = "2D",
        nn_counts: Literal["auto"] | dict = "auto",
    ):
        if isinstance(structures, Structure):
            structures = [structures]
        if not isinstance(structures, list):
            raise ValueError(
                "structures must be a Structure or a list of"
                " Structures."
            )
        # input validation mirrors the reference mixer
        # (picasso/spinna.py:1006-1100)
        if not isinstance(label_unc, dict):
            raise ValueError(
                "label_unc must be a dict keyed by target name (or"
                " 'ALL')."
            )
        if any(v < 0 for v in label_unc.values()):
            raise ValueError(
                "Label uncertainties must be non-negative."
            )
        if not isinstance(le, dict):
            raise ValueError(
                "le must be a dict keyed by target name (or 'ALL')."
            )
        if any(not 0 <= v <= 1 for v in le.values()):
            raise ValueError(
                "Labeling efficiencies must lie in [0, 1]."
            )
        if not (nn_counts == "auto" or isinstance(nn_counts, dict)):
            raise ValueError(
                "nn_counts must be 'auto' or a dict of target pairs."
            )
        self.structures = structures
        self.label_unc = label_unc
        self.le = le
        self.mask_dict = mask_dict
        self.roi = [width, height, depth]
        self.random_rot_mode = random_rot_mode
        self.nn_counts = nn_counts
        self.simulators: list[StructureSimulator] = []
        self.targets = self.get_target_names()
        for t in self.targets:
            for name, d in (("label_unc", label_unc), ("le", le)):
                if "ALL" not in d and t not in d:
                    raise ValueError(
                        f"Target {t!r} missing from {name}."
                    )
        if isinstance(nn_counts, dict):
            for i, t1 in enumerate(self.targets):
                for t2 in self.targets[i:]:
                    if f"{t1}-{t2}" not in nn_counts:
                        raise ValueError(
                            f"nn_counts missing pair '{t1}-{t2}'."
                        )
        if mask_dict is None and (width is None or height is None):
            raise ValueError(
                "Provide either a mask_dict or ROI width/height (nm)."
            )

    def get_target_names(self) -> list[str]:
        return _targets_from_structures(self.structures)

    def get_structure_names(self) -> list[str]:
        return [s.title for s in self.structures]

    def _per_target(self, d: dict, targets) -> list:
        if "ALL" in d:
            return [d["ALL"] for _ in targets]
        return [d[t] for t in targets]

    def extract_mask(self, structure):
        """Mask for a structure: single-target mask, or the
        count-weighted average for heteromultimers
        (picasso/spinna.py:2532)."""
        if self.mask_dict is None:
            return None, None
        masks = self.mask_dict.get("masks", {})
        info = self.mask_dict.get("infos", {})
        targets = structure.targets
        if len(targets) == 1:
            return masks[targets[0]], info[targets[0]]
        counts = structure.get_ind_target_count(targets)
        total = sum(counts)
        avg = sum(
            c / total * np.asarray(masks[t])
            for c, t in zip(counts, targets)
        )
        return avg, info[targets[0]]

    def run_simulation(self, N_structures, path: str = "") -> dict:
        """Simulate the mixture and return per-target coordinate
        arrays (picasso/spinna.py:2453)."""
        if any(N < 0 for N in N_structures):
            raise ValueError(
                "Numbers of structures must be positive numbers."
            )
        sim_results = []
        self.simulators = []
        width, height, depth = self.roi
        for i, structure in enumerate(self.structures):
            targets = structure.targets
            le = self._per_target(self.le, targets)
            label_unc = self._per_target(self.label_unc, targets)
            mask, mask_info = self.extract_mask(structure)
            sim = StructureSimulator(
                structure=structure,
                N_structures=N_structures[i],
                le=le,
                label_unc=label_unc,
                mask=mask,
                mask_info=mask_info,
                width=width,
                height=height,
                depth=depth,
                random_rot_mode=self.random_rot_mode,
            ).run()
            self.simulators.append(sim)
            sim_results.append(sim.pos_obs)
        all_locs = self.convert_sim_results(sim_results)
        if path:
            self.save(path, all_locs)
        return all_locs

    def convert_sim_results(self, sim_results) -> dict:
        out = {}
        for t in self.targets:
            parts = [
                r[t] for r in sim_results if t in r and len(r[t])
            ]
            if parts:
                out[t] = np.concatenate(parts)
            else:
                dim = 3 if self.roi[2] is not None else 2
                out[t] = np.zeros((0, dim))
        return out

    def save(self, path: str, all_locs: dict) -> None:
        base = path[:-5] if path.endswith(".hdf5") else path
        for t, coords in all_locs.items():
            io.save_locs(
                base + f"_sim_{t}.hdf5",
                coords_to_locs(coords),
                [self.get_metadata()],
            )

    def get_metadata(self, pixelsize: float = 130.0) -> dict:
        width_nm = self.roi[0]
        height_nm = self.roi[1]
        if width_nm is None and self.mask_dict is not None:
            # derive FOV from the first mask
            infos = self.mask_dict.get("infos", {})
            first = next(iter(infos.values()), {})
            shape = first.get("Shape", [1, 1])
            binsize = first.get("Binsize (nm)", 100.0)
            height_nm = shape[0] * binsize
            width_nm = shape[1] * binsize
        return {
            "Generated by": f"Picasso v{__version__} SPINNA",
            "Structures": self.get_structure_names(),
            "Targets": self.targets,
            "ROI (nm)": self.roi,
            "Frames": 1,
            "Width": int(np.ceil((width_nm or 1) / pixelsize)) + 1,
            "Height": int(np.ceil((height_nm or 1) / pixelsize)) + 1,
            "Pixelsize": pixelsize,
        }

    def get_neighbor_counts(self, target1, target2) -> int:
        if self.nn_counts == "auto":
            return max(
                (
                    s.get_max_nn(target1, target2)
                    for s in self.structures
                ),
                default=0,
            )
        return self.nn_counts[f"{target1}-{target2}"]

    def get_neighbor_idx(self, duplicate: bool = False):
        neighbor_idx = []
        for i, t1 in enumerate(self.targets):
            for t2 in self.targets[i:]:
                n = self.get_neighbor_counts(t1, t2)
                neighbor_idx.append((t1, t2, n))
                if duplicate and t1 != t2:
                    neighbor_idx.append((t2, t1, n))
        return neighbor_idx

    def convert_N_structures_to_array(self, N_structures):
        if isinstance(N_structures, dict):
            names = self.get_structure_names()
            return np.column_stack(
                [np.asarray(N_structures[n]) for n in names]
            ).astype(np.int32)
        arr = np.asarray(N_structures)
        if arr.ndim == 1:
            arr = arr.reshape(1, -1)
        return arr.astype(np.int32)

    def convert_counts_to_props(self, N_structures) -> np.ndarray:
        """Counts -> % of all targets (picasso/spinna.py:2836)."""
        N_structures = self.convert_N_structures_to_array(
            deepcopy(N_structures)
        )
        per_struct = np.array(
            [
                sum(s.get_ind_target_count(self.targets))
                for s in self.structures
            ]
        )
        totals = N_structures @ per_struct
        totals = np.maximum(totals, 1)
        props = np.round(
            100 * N_structures * per_struct[None, :]
            / totals[:, None],
            2,
        ).astype(np.float32)
        rows = np.where(np.sum(props, axis=1) != 100)[0]
        for r in rows:
            nz = np.nonzero(props[r] > 0)[0]
            if len(nz):
                props[r, nz[0]] -= np.sum(props[r]) - 100
        if props.shape[0] == 1:
            return props.reshape(-1)
        return props

    def convert_props_to_counts(self, proportions, N_total):
        proportions = np.float32(deepcopy(proportions))
        if proportions.ndim == 1:
            proportions = proportions.reshape(1, -1)
        N_total = np.int32(N_total)
        out = np.zeros(proportions.shape, np.int32)
        for i, s in enumerate(self.structures):
            out[:, i] = np.int32(
                N_total * proportions[:, i] / 100
                / s.get_all_targets_count()
            )
        if out.shape[0] == 1:
            return out.reshape(-1)
        return out

    @property
    def roi_size(self) -> float:
        w, h, d = self.roi
        if w is None:
            return 0.0
        if d is None:
            return w * h
        return w * h * d


# ---------------------------------------------------------------------------
# SPINNA fitting (picasso/spinna.py:3037)
# ---------------------------------------------------------------------------


class SPINNA:
    """Fit structure stoichiometries by comparing simulated and
    experimental NND distributions (KS statistic)."""

    def __init__(
        self,
        mixer: StructureMixer,
        gt_coords: dict,
        N_sim: int = 1,
        progress_title: str = "Spinning structures",
    ):
        if not isinstance(mixer, StructureMixer):
            raise TypeError(
                "Initialize the class with StructureMixer."
            )
        self.mixer = mixer
        self.N_sim = N_sim
        self.progress_title = progress_title
        if mixer.roi[0] is not None and mixer.roi[2] is None:
            gt_coords = {
                k: v[:, :2] for k, v in gt_coords.items()
            }
        self.gt_coords = gt_coords
        self.dists_gt = get_NN_dist_experimental(gt_coords, mixer)

    def fit(self, N_structures, **kwargs):
        return self.fit_stoichiometry(N_structures, **kwargs)

    def fit_stoichiometry(
        self,
        N_structures,
        *,
        fitting_mode: Literal[
            "coarse-to-fine", "bayesian", "brute-force"
        ] = "coarse-to-fine",
        save: str = "",
        asynch: bool = True,
        bootstrap: bool = False,
        return_scores: bool = False,
        callback=None,
    ):
        assert fitting_mode in (
            "coarse-to-fine", "bayesian", "brute-force",
        )
        if fitting_mode == "coarse-to-fine":
            return self.fit_coarse_to_fine(
                N_structures, save=save, bootstrap=bootstrap,
                return_scores=return_scores, callback=callback,
            )
        if fitting_mode == "bayesian":
            return self.fit_bayesian(
                N_structures, save=save, bootstrap=bootstrap,
                return_scores=return_scores, callback=callback,
            )
        return self._fit_brute(
            N_structures, save=save, bootstrap=bootstrap,
            return_scores=return_scores, callback=callback,
        )

    # -- scoring --
    def _evaluate_single(self, N_row) -> float:
        dists_sim = get_NN_dist_simulated(
            N_row, self.N_sim, self.mixer, duplicate=False
        )
        return NND_score(dists_sim, self.dists_gt)

    def _get_batched_scorer(self, N_structures):
        """Build (or reuse) the device BatchedScorer for this mixer.

        Cached per (padded-shape bucket, dists_gt identity): the
        coarse/fine/bootstrap passes share one compiled program, and a
        bootstrap's swapped ground-truth distances invalidate it.
        """
        from picasso_tpu.ops.spinna_batch import BatchedScorer, _bucket

        N_structures = np.asarray(N_structures)
        max_counts = np.maximum(np.max(N_structures, axis=0), 1)
        # true per-target max of total placed points over candidates
        # (conserved-total search spaces make this ~half the naive
        # per-structure pad sum, shrinking the distance tiles)
        t_counts = _find_target_counts(
            self.mixer.targets, self.mixer.structures
        )  # (n_targets, n_structures)
        max_points = np.max(
            N_structures @ t_counts.T, axis=0
        ).astype(np.int64)
        buckets = tuple(_bucket(int(c)) for c in max_counts) + tuple(
            _bucket(int(max(p, 1))) for p in max_points
        )
        cached = getattr(self, "_batched_cache", None)
        if (
            cached is not None
            and cached[0] == buckets
            and cached[1] is self.dists_gt
        ):
            return cached[2]
        scorer = BatchedScorer(
            self.mixer, self.dists_gt, self.N_sim, max_counts,
            max_points=max_points,
        )
        self._batched_cache = (buckets, self.dists_gt, scorer)
        return scorer

    def NN_scorer(self, N_structures, callback=None):
        """Score all candidate rows.

        The default path simulates + scores candidate batches as one
        jitted device program (ops.spinna_batch) — the TPU-native
        replacement for the reference's ProcessPool
        (picasso/spinna.py:3280). ``PICASSO_TPU_SPINNA`` = host forces
        the serial numpy scorer (used for equivalence tests); = device
        forces batching even for tiny candidate sets.
        """
        import os as _os

        N_structures = np.asarray(N_structures)
        mode = _os.environ.get("PICASSO_TPU_SPINNA", "auto")
        use_batched = mode != "host" and (
            mode == "device" or len(N_structures) >= 4
        )
        if use_batched:
            try:
                scorer = self._get_batched_scorer(N_structures)
                rep = lib.progress_reporter(
                    callback, len(N_structures), self.progress_title
                )
                scores = scorer.score(
                    N_structures, progress=rep.set_value
                )
                rep.close()
                return N_structures, scores
            except Exception:
                if mode == "device":
                    raise
                import warnings

                warnings.warn(
                    "batched SPINNA scoring failed; falling back to"
                    " the serial scorer", RuntimeWarning,
                )
        rep = lib.progress_reporter(
            callback, len(N_structures), self.progress_title
        )
        scores = np.empty(len(N_structures))
        for i, row in enumerate(N_structures):
            scores[i] = self._evaluate_single(row)
            rep.set_value(i + 1)
        rep.close()
        return N_structures, scores

    @staticmethod
    def _farthest_point_sampling(points, n_samples):
        """Maximin sampling starting from the centroid-nearest point
        (picasso/spinna.py:3870)."""
        n_total = points.shape[0]
        n_samples = min(n_samples, n_total)
        centroid = points.mean(axis=0)
        first = int(
            np.argmin(np.linalg.norm(points - centroid, axis=1))
        )
        selected = [first]
        min_d = np.linalg.norm(points - points[first], axis=1)
        for _ in range(n_samples - 1):
            nxt = int(np.argmax(min_d))
            selected.append(nxt)
            min_d = np.minimum(
                min_d,
                np.linalg.norm(points - points[nxt], axis=1),
            )
        return np.array(selected)

    def get_subset_N_structures(
        self, N_structures, center, radius: float = BOOTSTRAP_DISTANCE,
        p: float = None,
    ):
        """Candidates within radius (in proportion space) of a center,
        measured with the Minkowski-p metric — the reference defaults to
        p=1, i.e. Manhattan distance (picasso/spinna.py:3970-4012)."""
        if p is None:
            p = BOOTSTRAP_DISTANCE_METRIC
        props = self.mixer.convert_counts_to_props(N_structures)
        if props.ndim == 1:
            props = props.reshape(1, -1)
        center_props = self.mixer.convert_counts_to_props(
            np.asarray(center).reshape(1, -1)
        )
        diff = np.abs(props - center_props)
        if np.isinf(p):
            d = diff.max(axis=1)
        else:
            d = (diff**p).sum(axis=1) ** (1 / p)
        subset = N_structures[d <= radius]
        if len(subset) == 0:
            subset = np.asarray(center).reshape(1, -1)
        return subset

    def _finalize(
        self, N_structures, scores, save, bootstrap,
        return_scores, callback,
    ):
        best = int(np.argmin(scores))
        opt_N = N_structures[best]
        opt_props = self.mixer.convert_counts_to_props(opt_N)
        score = float(scores[best])
        if save:
            props = self.mixer.convert_counts_to_props(N_structures)
            if props.ndim == 1:
                props = props.reshape(1, -1)
            names = self.mixer.get_structure_names()
            df = pd.DataFrame(
                np.hstack(
                    (N_structures, props, scores.reshape(-1, 1))
                ),
                columns=[f"N_{n}" for n in names]
                + [f"Prop_{n}" for n in names]
                + ["Kolmogorov-Smirnov statistic"],
            )
            df.to_csv(save, header=True, index=False)
        if bootstrap:
            result = self._run_bootstrap(
                N_structures, opt_N, opt_props, score, callback
            )
            if return_scores:
                return (*result, scores)
            return result
        if return_scores:
            return opt_props, score, scores
        return opt_props, score

    def _fit_brute(
        self, N_structures, save="", bootstrap=False,
        return_scores=False, callback=None,
    ):
        if isinstance(N_structures, dict):
            N_structures = self.mixer.convert_N_structures_to_array(
                N_structures
            )
        N_structures, scores = self.NN_scorer(
            N_structures, callback=callback
        )
        return self._finalize(
            N_structures, scores, save, bootstrap, return_scores,
            callback,
        )

    def fit_coarse_to_fine(
        self,
        N_structures,
        coarse_fraction: float = 0.1,
        radius: float = BOOTSTRAP_DISTANCE,
        save: str = "",
        bootstrap: bool = False,
        return_scores: bool = False,
        callback=None,
    ):
        """Coarse pass over a farthest-point subsample, then a fine
        pass around the winner (picasso/spinna.py:3322)."""
        if isinstance(N_structures, dict):
            N_structures = self.mixer.convert_N_structures_to_array(
                N_structures
            )
        n_total = N_structures.shape[0]
        n_coarse = max(2, int(n_total * coarse_fraction))
        props = self.mixer.convert_counts_to_props(N_structures)
        if props.ndim == 1:
            props = props.reshape(1, -1)
        coarse_idx = self._farthest_point_sampling(props, n_coarse)
        N_coarse = N_structures[coarse_idx]
        N_coarse, scores_coarse = self.NN_scorer(
            N_coarse, callback=callback
        )
        coarse_best = N_coarse[int(np.argmin(scores_coarse))]
        N_fine = self.get_subset_N_structures(
            N_structures, coarse_best, radius=radius
        )
        N_fine, scores_fine = self.NN_scorer(
            N_fine, callback=callback
        )
        return self._finalize(
            N_fine, scores_fine, save, bootstrap, return_scores,
            callback,
        )

    def fit_bayesian(
        self,
        N_structures,
        n_initial: int = 20,
        n_iterations: int = 80,
        save: str = "",
        bootstrap: bool = False,
        return_scores: bool = False,
        callback=None,
    ):
        """Bayesian optimization with a GP (Matérn) surrogate and
        expected improvement (picasso/spinna.py:3441)."""
        from scipy.stats import norm
        from sklearn.gaussian_process import GaussianProcessRegressor
        from sklearn.gaussian_process.kernels import Matern

        if isinstance(N_structures, dict):
            N_structures = self.mixer.convert_N_structures_to_array(
                N_structures
            )
        n_total = N_structures.shape[0]
        props = self.mixer.convert_counts_to_props(N_structures)
        if props.ndim == 1:
            props = props.reshape(1, -1)
        n_initial = min(n_initial, n_total)
        evaluated = list(
            self._farthest_point_sampling(props, n_initial)
        )
        # the initial design is scored as one device batch; the GP
        # loop below is inherently one-candidate-at-a-time
        _, init_scores = self.NN_scorer(
            N_structures[np.asarray(evaluated, int)]
        )
        scores = {
            int(i): float(s)
            for i, s in zip(evaluated, init_scores)
        }
        rep = lib.progress_reporter(
            callback, n_initial + n_iterations, self.progress_title
        )
        rep.set_value(len(evaluated))
        for it in range(n_iterations):
            remaining = np.setdiff1d(
                np.arange(n_total), list(scores.keys())
            )
            if len(remaining) == 0:
                break
            X = props[list(scores.keys())]
            y = np.array(list(scores.values()))
            gp = GaussianProcessRegressor(
                kernel=Matern(nu=2.5),
                normalize_y=True,
                alpha=1e-4,
            )
            gp.fit(X, y)
            mu, std = gp.predict(props[remaining], return_std=True)
            best_y = y.min()
            with np.errstate(divide="ignore", invalid="ignore"):
                z = (best_y - mu) / np.maximum(std, 1e-12)
                ei = (best_y - mu) * norm.cdf(z) + std * norm.pdf(z)
            nxt = int(remaining[int(np.argmax(ei))])
            scores[nxt] = self._evaluate_single(N_structures[nxt])
            rep.set_value(n_initial + it + 1)
        rep.close()
        idx = np.array(list(scores.keys()))
        vals = np.array(list(scores.values()))
        return self._finalize(
            N_structures[idx], vals, save, bootstrap, return_scores,
            callback,
        )

    def _run_bootstrap(
        self, N_structures, opt_N, opt_props, score, callback
    ):
        """Bootstrap uncertainty of the best fit
        (picasso/spinna.py:3786)."""
        exp_dists = deepcopy(self.dists_gt)
        subset = self.get_subset_N_structures(N_structures, opt_N)
        boot_scores = []
        boot_props = []
        for i in range(N_BOOTSTRAPS):
            gt_boot = self.mixer.run_simulation(opt_N)
            self.dists_gt = get_NN_dist_experimental(
                gt_boot, self.mixer
            )
            _, scores_b = self.NN_scorer(subset, callback=None)
            b = int(np.argmin(scores_b))
            boot_scores.append(scores_b[b])
            boot_props.append(
                self.mixer.convert_counts_to_props(subset[b])
            )
        self.dists_gt = exp_dists
        return (
            (opt_props, np.std(boot_props, axis=0)),
            (score, float(np.std(boot_scores))),
        )

    def fit_stoichiometry_parallel(self, N_structures):
        """API-compatible analogue of the reference's ProcessPool
        entry (picasso/spinna.py:3280): candidates are scored by the
        batched device program via NN_scorer."""
        return [self.NN_scorer(N_structures)]


# ---------------------------------------------------------------------------
# Model comparison / labeling-efficiency fitting
# (picasso/spinna.py:4181/4534)
# ---------------------------------------------------------------------------


def compare_models(
    models: list[list[Structure]],
    exp_data: dict,
    granularity: int,
    label_unc: dict,
    N_sim: int = 1,
    mask_dict: dict | None = None,
    width: float | None = None,
    height: float | None = None,
    depth: float | None = None,
    random_rot_mode: Literal["2D", "3D"] | None = "2D",
    le: dict | None = None,
    asynch: bool = True,
    savedir: str = "",
    callback=None,
    fitting_mode: Literal[
        "coarse-to-fine", "bayesian", "brute-force"
    ] = "coarse-to-fine",
):
    """Fit every candidate model (structure set x label-uncertainty
    combination) and rank by KS score (picasso/spinna.py:4181).

    Returns (best_model_idx, best_label_unc, best_score, best_props,
    best_mixer, all_scores)."""
    targets_all = sorted(
        {t for m in models for s in m for t in s.targets}
    )
    if le is None:
        le = {"ALL": 1.0}
    # label_unc: per-target candidate lists
    unc_lists = [
        label_unc[t] if isinstance(label_unc[t], (list, np.ndarray))
        else [label_unc[t]]
        for t in targets_all
    ]
    best = None
    all_scores = []
    for mi, structures in enumerate(models):
        for unc_combo in it_prod(*unc_lists):
            unc = dict(zip(targets_all, unc_combo))
            mixer = StructureMixer(
                structures=structures,
                label_unc=unc,
                le=le,
                mask_dict=mask_dict,
                width=width,
                height=height,
                depth=depth,
                random_rot_mode=random_rot_mode,
            )
            N_total = {
                t: int(
                    len(exp_data[t])
                    / (le.get(t, le.get("ALL", 1.0)))
                )
                for t in mixer.targets
            }
            try:
                N_structures = generate_N_structures(
                    structures, N_total, granularity
                )
            except ValueError:
                continue
            spinna = SPINNA(mixer, exp_data, N_sim=N_sim)
            props, score = spinna.fit_stoichiometry(
                N_structures,
                fitting_mode=fitting_mode,
                callback=callback,
            )[:2]
            all_scores.append(
                {
                    "model": mi,
                    "label_unc": unc,
                    "score": score,
                    "props": props,
                }
            )
            if best is None or score < best[2]:
                best = (mi, unc, score, props, mixer)
    if best is None:
        raise ValueError("No model could be fitted.")
    return (*best, all_scores)


def get_le_from_props(props, structures, targets) -> dict:
    """Reinterpret fitted structure proportions of the
    monomer/monomer/heterodimer model as labeling efficiencies
    (picasso/spinna.py:4480-like)."""
    # fraction of target molecules bound in the heterodimer
    le = {}
    t_counts = _find_target_counts(targets, structures)
    props = np.asarray(props, np.float64)
    for i, t in enumerate(targets):
        in_het = props[-1]
        total = props @ (t_counts[i] > 0)
        le[t] = float(100 * in_het / total) if total > 0 else 0.0
    return le


def fit_le(
    target_a: str,
    target_b: str,
    exp_data: dict,
    granularity: int,
    label_unc: dict,
    distances: list[float],
    N_sim: int = 1,
    mask_dict: dict | None = None,
    width: float | None = None,
    height: float | None = None,
    depth: float | None = None,
    random_rot_mode: Literal["2D", "3D"] | None = "2D",
    asynch: bool = True,
    savedir: str = "",
    callback=None,
    fitting_mode: Literal[
        "coarse-to-fine", "bayesian", "brute-force"
    ] = "coarse-to-fine",
):
    """Fit labeling efficiency for two targets via the
    monomer-A/monomer-B/heterodimer-AB model family
    (picasso/spinna.py:4534)."""
    if target_a not in exp_data or target_b not in exp_data:
        raise ValueError(
            "Both target_a and target_b must be present in exp_data."
        )
    if target_a == target_b:
        raise ValueError("target_a and target_b must be distinct.")
    if len(distances) == 0:
        raise ValueError("distances must contain at least one value.")
    monomer_a = Structure(f"Monomer_{target_a}")
    monomer_a.define_coordinates(target_a, [0.0], [0.0], [0.0])
    monomer_b = Structure(f"Monomer_{target_b}")
    monomer_b.define_coordinates(target_b, [0.0], [0.0], [0.0])
    models = []
    for d in distances:
        het = Structure(
            f"Het_{target_a}_{target_b}_{float(d):.2f}nm"
        )
        het.define_coordinates(target_a, [-float(d) / 2], [0.0], [0.0])
        het.define_coordinates(target_b, [float(d) / 2], [0.0], [0.0])
        models.append([monomer_a, monomer_b, het])
    (best_mi, best_unc, best_score, best_props, best_mixer,
     _scores) = compare_models(
        models,
        exp_data,
        granularity,
        label_unc,
        N_sim=N_sim,
        mask_dict=mask_dict,
        width=width,
        height=height,
        depth=depth,
        random_rot_mode=random_rot_mode,
        le={"ALL": 1.0},
        asynch=asynch,
        savedir=savedir,
        callback=callback,
        fitting_mode=fitting_mode,
    )
    structures = models[best_mi]
    le_values = get_le_from_props(
        best_props, structures, [target_a, target_b]
    )
    return (
        le_values,
        best_unc,
        distances[best_mi],
        best_score,
        best_props,
        best_mixer,
    )


# ---------------------------------------------------------------------------
# API-compatibility aliases + plotting
# ---------------------------------------------------------------------------

find_target_counts = _find_target_counts
get_structures_permutation = _get_structures_permutation
targets_from_structures = _targets_from_structures

NN_COLORS = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]


def check_structures_valid_for_fitting(
    structures, N_total: dict
) -> bool:
    """True if a stoichiometry search space can be generated for the
    structures given the total target counts."""
    targets = _targets_from_structures(structures)
    if len(structures) < len(targets):
        return False
    if any(t not in N_total for t in targets):
        return False
    try:
        generate_N_structures(structures, N_total, granularity=2)
        return True
    except (ValueError, np.linalg.LinAlgError):
        return False


def plot_NN(
    dists_exp,
    dists_sim,
    mixer,
    bin_size: float = 4.0,
    fig=None,
):
    """Overlay experimental and best-fit simulated NND histograms per
    target pair (picasso/spinna.py:499)."""
    import matplotlib.pyplot as plt

    neighbor_idx = [
        t for t in mixer.get_neighbor_idx() if t[2]
    ]
    n = max(1, len(neighbor_idx))
    if fig is None:
        fig = plt.figure(figsize=(5 * n, 4))
    for i, ((t1, t2, nn), de, ds) in enumerate(
        zip(neighbor_idx, dists_exp, dists_sim)
    ):
        ax = fig.add_subplot(1, n, i + 1)
        upper = (
            np.percentile(de, 99) if len(de) else 100.0
        )
        bins = np.arange(0, upper + bin_size, bin_size)
        for k in range(de.shape[1] if len(de) else 0):
            color = NN_COLORS[k % len(NN_COLORS)]
            ax.hist(
                de[:, k], bins=bins, density=True, alpha=0.4,
                color=color, label=f"exp NN{k + 1}",
            )
            if len(ds):
                hist, edges = np.histogram(
                    ds[:, k], bins=bins, density=True
                )
                centers = (edges[:-1] + edges[1:]) / 2
                ax.plot(
                    centers, hist, color=color,
                    label=f"sim NN{k + 1}",
                )
        ax.set_xlabel("distance (nm)")
        ax.set_ylabel("density")
        ax.set_title(f"{t1} -> {t2}")
        ax.legend(fontsize=7)
    return fig


def compare_models_given_label_unc(
    models,
    exp_data,
    granularity,
    label_unc: dict,
    **kwargs,
):
    """Compare structure models at ONE fixed label uncertainty per
    target (picasso/spinna.py:4367) — thin wrapper over
    compare_models with scalar label_unc entries."""
    fixed = {
        k: (v if not isinstance(v, (list, np.ndarray)) else v[0])
        for k, v in label_unc.items()
    }
    return compare_models(
        models, exp_data, granularity, fixed, **kwargs
    )


# ---------------------------------------------------------------------------
# Batch analysis (CSV-parameterized runs; reference CLI
# picasso/__main__.py:2210 _spinna_batch_analysis + helpers :1403-2088)
# ---------------------------------------------------------------------------


def _batch_targets_from_row(row) -> list[str]:
    """Targets inferred from the exp_data_* columns (LE-fitting rows
    carry no structures file)."""
    targets = [
        c[len("exp_data_"):]
        for c in row.index
        if c.startswith("exp_data_") and not pd.isna(row[c])
    ]
    if len(targets) != 2:
        raise ValueError(
            "LE fitting requires exactly two exp_data_* columns; got"
            f" {targets}."
        )
    return targets


def _batch_load_target_data(row, targets, le_fitting):
    """Per-target experimental coords (nm), label uncertainties, LEs
    and simulated molecule counts from one CSV row."""
    label_unc: dict = {}
    le: dict = {}
    exp_data: dict = {}
    n_simulated: dict = {}
    infos: dict = {}
    dim = 2
    for t in targets:
        for col in (f"label_unc_{t}", f"exp_data_{t}"):
            if col not in row.index:
                raise ValueError(
                    f"Column {col} not found in the parameters file."
                )
        if not le_fitting and f"le_{t}" not in row.index:
            raise ValueError(
                f"Column le_{t} not found in the parameters file."
            )
        if le_fitting:
            label_unc[t] = [
                float(v)
                for v in str(row[f"label_unc_{t}"]).split(",") if v
            ]
            le[t] = 1.0
        else:
            label_unc[t] = float(row[f"label_unc_{t}"])
            le[t] = float(row[f"le_{t}"]) / 100
        locs, info = io.load_locs(str(row[f"exp_data_{t}"]))
        infos[t] = info
        pixelsize = lib.get_from_metadata(info, "Pixelsize", 130)
        if "z" in locs.columns:
            exp_data[t] = np.column_stack([
                locs["x"].to_numpy() * pixelsize,
                locs["y"].to_numpy() * pixelsize,
                locs["z"].to_numpy(),
            ])
            dim = 3
        else:
            exp_data[t] = np.column_stack([
                locs["x"].to_numpy() * pixelsize,
                locs["y"].to_numpy() * pixelsize,
            ])
        n_simulated[t] = (
            len(locs) if le_fitting else int(len(locs) / le[t])
        )
    return label_unc, le, exp_data, n_simulated, dim, infos


def _batch_resolve_roi(row, dim, targets, infos):
    """ROI for one row: homogeneous area/volume, metadata area
    fallback, or per-target density masks."""
    apply_mask = True
    area = volume = z_range = None
    mask_paths: dict = {}
    if dim == 3:
        if "volume" in row.index and not pd.isna(row["volume"]):
            volume = float(row["volume"])
            apply_mask = False
            if "z_range" not in row.index:
                raise ValueError(
                    "3D homogeneous simulation needs a z_range column."
                )
            z_range = float(row["z_range"])
    else:
        if "area" in row.index and pd.notna(row["area"]):
            area = float(row["area"])
            apply_mask = False
        elif infos:
            meta_area = lib.get_from_metadata(
                infos[targets[0]], "Area (um^2)"
            )
            if meta_area is not None:
                area = float(meta_area)
                apply_mask = False
    if apply_mask:
        for t in targets:
            col = f"mask_filename_{t}"
            if col not in row.index or pd.isna(row[col]):
                raise ValueError(
                    f"Column {col} required (no area/volume given)."
                )
            mask_paths[t] = str(row[col])
    return apply_mask, mask_paths, area, volume, z_range


def _batch_roi_to_mixer_kwargs(
    targets, apply_mask, mask_paths, dim, area, volume, z_range
):
    if apply_mask:
        import yaml as _yaml

        masks, mask_infos = {}, {}
        for t in targets:
            masks[t] = np.load(mask_paths[t])
            ipath = os.path.splitext(mask_paths[t])[0] + ".yaml"
            with open(ipath) as f:
                mask_infos[t] = _yaml.full_load(f)
        return dict(
            mask_dict={"masks": masks, "infos": mask_infos},
            width=None, height=None, depth=None,
        )
    if dim == 2:
        side = float(np.sqrt(area * 1e6))  # um^2 -> nm side
        return dict(
            mask_dict=None, width=side, height=side, depth=None
        )
    depth = z_range
    side = float(np.sqrt(volume * 1e9 / depth))
    return dict(
        mask_dict=None, width=side, height=side, depth=depth
    )


def batch_analysis(
    parameters_filename: str,
    asynch: bool = True,
    bootstrap: bool = False,
    verbose: bool = False,
    fitting_mode: Literal[
        "coarse-to-fine", "bayesian", "brute-force"
    ] = "bayesian",
) -> pd.DataFrame:
    """SPINNA batch analysis from a CSV parameters file — one fit
    (or LE fit, when ``le_fitting=1``) per row, results saved to a
    fresh ``<parameters>__fitting_results`` directory. Column contract
    matches the reference CLI (picasso/__main__.py:2210): per-target
    ``exp_data_*``/``label_unc_*``/``le_*`` columns, ``granularity``,
    ``sim_repeats``, ``save_filename``, ``NND_bin``, ``NND_maxdist``,
    ROI via ``area``/``volume``+``z_range``/``mask_filename_*`` (with
    the 'Area (um^2)' metadata fallback), optional ``rotation_mode``,
    ``le_fitting`` and ``distances``. Returns the summary DataFrame
    (also written as ``summary_results.csv``)."""
    if not isinstance(parameters_filename, str):
        raise TypeError(
            "parameters_filename must be a string ending with .csv"
        )
    if not parameters_filename.endswith(".csv"):
        raise TypeError("parameters_filename must end with .csv")
    parameters = pd.read_csv(parameters_filename)
    for column in (
        "granularity", "save_filename", "NND_bin", "NND_maxdist",
        "sim_repeats",
    ):
        if column not in parameters.columns:
            raise ValueError(
                f"Column {column} not found in the parameters file."
            )
    base, _ = os.path.splitext(parameters_filename)
    result_dir = base + "__fitting_results"
    i = 1
    while os.path.isdir(result_dir):
        result_dir = base + f"__fitting_results_{i}"
        i += 1
    os.makedirs(result_dir)

    summary = []
    for index, row in parameters.iterrows():
        summary.append(
            _batch_process_row(
                index, row, result_dir, asynch=asynch,
                bootstrap=bootstrap, verbose=verbose,
                fitting_mode=fitting_mode,
            )
        )
    summary = pd.DataFrame(summary)
    summary.to_csv(
        os.path.join(result_dir, "summary_results.csv"), index=False
    )
    return summary


def _batch_process_row(
    index, row, result_dir, *, asynch, bootstrap, verbose,
    fitting_mode,
):
    granularity = int(row["granularity"])
    sim_repeats = int(row["sim_repeats"])
    save_base, _ = os.path.splitext(str(row["save_filename"]))
    save_filename = os.path.join(
        result_dir, os.path.basename(save_base)
    )
    le_fitting = (
        "le_fitting" in row.index
        and not pd.isna(row["le_fitting"])
        and int(row["le_fitting"]) == 1
    )
    random_rot_mode = "2D"
    if "rotation_mode" in row.index and isinstance(
        row["rotation_mode"], str
    ):
        random_rot_mode = row["rotation_mode"]
        if random_rot_mode == "None":
            random_rot_mode = None

    if le_fitting:
        targets = _batch_targets_from_row(row)
        structures = None
    else:
        if "structures_filename" not in row.index or pd.isna(
            row["structures_filename"]
        ):
            raise ValueError(
                f"Row {index}: structures_filename is required when"
                " le_fitting != 1."
            )
        structures, targets = load_structures(
            str(row["structures_filename"])
        )
    label_unc, le, exp_data, n_simulated, dim, infos = (
        _batch_load_target_data(row, targets, le_fitting)
    )
    apply_mask, mask_paths, area, volume, z_range = (
        _batch_resolve_roi(row, dim, targets, infos)
    )
    roi_kwargs = _batch_roi_to_mixer_kwargs(
        targets, apply_mask, mask_paths, dim, area, volume, z_range
    )

    if le_fitting:
        if "distances" not in row.index or pd.isna(row["distances"]):
            raise ValueError(
                f"Row {index}: distances is required when"
                " le_fitting=1."
            )
        distances = [
            float(v) for v in str(row["distances"]).split(",") if v
        ]
        # per-target label-unc candidates -> grid over products
        le_out, best_unc, best_d, best_score, best_props, mixer = (
            fit_le(
                targets[0], targets[1], exp_data, granularity,
                label_unc, distances, N_sim=sim_repeats,
                random_rot_mode=random_rot_mode, asynch=asynch,
                fitting_mode=fitting_mode, **roi_kwargs,
            )
        )
        results = {
            "row": index,
            "le_fitting": 1,
            "targets": ",".join(targets),
            "best_distance_nm": best_d,
            "score": float(best_score),
            **{f"le_{t}": le_out[t] for t in targets},
            **{
                f"label_unc_{t}": best_unc[t]
                if isinstance(best_unc, dict) else best_unc
                for t in targets
            },
        }
        opt_props = best_props
    else:
        N_structures = generate_N_structures(
            structures, n_simulated, granularity
        )
        mixer = StructureMixer(
            structures=structures, label_unc=label_unc, le=le,
            random_rot_mode=random_rot_mode, **roi_kwargs,
        )
        fit_out = SPINNA(
            mixer=mixer, gt_coords=exp_data, N_sim=sim_repeats
        ).fit_stoichiometry(
            N_structures,
            fitting_mode=fitting_mode,
            save=f"{save_filename}_fit_scores.csv",
            bootstrap=bootstrap,
            callback="console" if verbose else None,
        )
        if bootstrap:
            (opt_props, prop_sems), (score, score_sem) = fit_out
        else:
            opt_props, score = fit_out
            prop_sems = score_sem = None
        names = mixer.get_structure_names()
        results = {
            "row": index,
            "le_fitting": 0,
            "targets": ",".join(targets),
            "score": float(np.asarray(score).reshape(-1)[0]),
            **{
                f"prop_{n}": float(p)
                for n, p in zip(names, np.atleast_1d(opt_props))
            },
        }
        if prop_sems is not None:
            results.update({
                f"prop_sem_{n}": float(p)
                for n, p in zip(names, np.atleast_1d(prop_sems))
            })

    with open(f"{save_filename}_fit_summary.txt", "w") as f:
        for key, value in results.items():
            f.write(f"{key}: {value}\n")

    # NND overlay plot at the fitted proportions
    try:
        import matplotlib

        matplotlib.use("Agg")
        N_best = mixer.convert_props_to_counts(
            np.atleast_1d(opt_props),
            sum(n_simulated[t] for t in targets),
        )
        dists_exp = get_NN_dist_experimental(exp_data, mixer)
        dists_sim = get_NN_dist_simulated(
            np.atleast_1d(N_best), sim_repeats, mixer
        )
        fig = plot_NN(
            dists_exp, dists_sim, mixer,
            bin_size=float(row["NND_bin"]),
        )
        fig.savefig(f"{save_filename}_NND.png", dpi=120)
        import matplotlib.pyplot as plt

        plt.close(fig)
    except Exception as exc:  # plot failure must not kill the batch
        print(f"Row {index}: NND plot failed ({exc})")
    return results

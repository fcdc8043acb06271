"""3DGS-standard PLY import/export for Gaussian models.

The Gaussian-splatting ecosystem (INRIA 3DGS, and every viewer/tool built on
the reference rasterizer family) exchanges models as binary-little-endian PLY
with per-vertex fields::

    x y z nx ny nz f_dc_0..2 f_rest_0..(3M-4) opacity scale_0..2 rot_0..3

- ``f_dc`` are the degree-0 SH coefficients, ``f_rest`` the higher orders in
  channel-major order (all R coefficients, then G, then B);
- ``opacity`` is the pre-sigmoid logit, ``scale`` the pre-exp log —
  matching this package's ``GaussianModel`` parametrization directly;
- ``rot`` is the unnormalized quaternion (r, x, y, z), like the reference's
  unnormalized-quaternion convention (forward.cu:127).

Implemented with numpy structured arrays only (no plyfile dependency).
"""

from __future__ import annotations

import numpy as np

from ..models.gaussians import GaussianModel, init_model


def save_ply(path: str, model: GaussianModel):
    """Write the ACTIVE Gaussians in 3DGS PLY layout."""
    act = np.asarray(model.active)
    means = np.asarray(model.means3D)[act]
    scales = np.asarray(model.scales_log)[act]
    rots = np.asarray(model.rotations)[act]
    opac = np.asarray(model.opacities_logit)[act]
    sh = np.asarray(model.sh)[act]                        # (N, M, 3)
    n, m, _ = sh.shape
    f_dc = sh[:, 0, :]                                    # (N, 3)
    # channel-major rest coefficients, the 3DGS convention
    f_rest = sh[:, 1:, :].transpose(0, 2, 1).reshape(n, 3 * (m - 1))

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(3 * (m - 1))]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    data = np.zeros(n, dtype=[(nm, "<f4") for nm in names])
    cols = np.concatenate(
        [means, np.zeros((n, 3), np.float32), f_dc, f_rest, opac,
         scales, rots], axis=1)
    for i, nm in enumerate(names):
        data[nm] = cols[:, i]

    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}"]
        header += [f"property float {nm}" for nm in names]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        data.tofile(f)


def load_ply(path: str, capacity: int = None) -> GaussianModel:
    """Read a 3DGS PLY into a GaussianModel (padded to ``capacity``)."""
    with open(path, "rb") as f:
        names = []
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                names.append(line.split()[-1])
            elif line == "end_header":
                break
            elif line.startswith("format") and "binary_little_endian" not in line:
                raise ValueError(f"unsupported PLY format: {line}")
        data = np.fromfile(f, dtype=[(nm, "<f4") for nm in names], count=n)

    def cols(prefix, k):
        return np.stack([data[f"{prefix}_{i}"] for i in range(k)], -1)

    means = np.stack([data["x"], data["y"], data["z"]], -1)
    n_rest = len([nm for nm in names if nm.startswith("f_rest_")])
    m = 1 + n_rest // 3
    sh = np.zeros((n, m, 3), np.float32)
    sh[:, 0, :] = cols("f_dc", 3)
    if n_rest:
        sh[:, 1:, :] = cols("f_rest", n_rest).reshape(
            n, 3, m - 1).transpose(0, 2, 1)

    import jax.numpy as jnp
    cap = capacity or n
    if cap < n:
        raise ValueError(
            f"PLY file holds {n} Gaussians but capacity={cap}; pass "
            f"capacity >= {n} (never a silent cap)")
    sh_degree = int(round(m ** 0.5)) - 1
    model = init_model(cap, sh_degree=sh_degree)
    pad = lambda a, fill=0.0: jnp.asarray(
        np.concatenate([a, np.full((cap - n, *a.shape[1:]), fill,
                                   np.float32)], 0) if cap > n else a[:cap])
    return model.replace(
        means3D=pad(means),
        scales_log=pad(cols("scale", 3)),
        rotations=pad(cols("rot", 4)),
        opacities_logit=pad(data["opacity"][:, None].astype(np.float32)),
        sh=pad(sh),
        active=jnp.arange(cap) < n,
    )

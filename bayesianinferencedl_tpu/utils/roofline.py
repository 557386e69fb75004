"""Roofline / MFU accounting for the hot kernels (SURVEY.md A.6; VERDICT.md
round-1 item 4: relate measured rates to hardware peaks so "fast" is
absolute, not relative).

Peak figures are for one TPU v5e chip (public spec):
  * HBM bandwidth 819 GB/s.
  * MXU 197 TFLOP/s bf16. f32 matmuls at precision=HIGHEST run ~6 bf16
    passes, so the effective f32 MXU ceiling is ~197/6 = 32.8 TFLOP/s.
  * VPU (vector unit): 4 SIMD subunits x (8x128) lanes x 2 flops (FMA) at
    ~940 MHz = ~7.7 TFLOP/s f32 — the ceiling for elementwise/stencil work.

FLOP counts below are analytic per-shape tallies of the algorithms as
implemented (ops/pcg_stencil.py, rom/galerkin.py solve_pcg,
models/surrogate.py), so achieved/peak ratios are model-flops-utilization
(MFU), not a profiler artifact.
"""

from __future__ import annotations

V5E_HBM_BYTES_PER_S = 819e9
V5E_MXU_BF16_FLOPS = 197e12
V5E_MXU_F32_FLOPS = V5E_MXU_BF16_FLOPS / 6.0  # precision=HIGHEST ~ bf16x6
V5E_VPU_F32_FLOPS = 7.7e12


def stencil_pcg_flops(grid_x: int, grid_y: int, iters: float) -> float:
    """FLOPs of one PCG solve on the 7-diagonal stencil kernel.

    Per iteration per cell: 7-point matvec (7 mul + 6 add), three axpy-style
    vector updates (6), Jacobi apply (1), and three reductions (r.r, p.Ap,
    r.z ~ 6) => ~26 flops/cell/iter (ops/pcg_stencil.py body)."""
    return 26.0 * grid_x * grid_y * iters


def stencil_pcg_flops_flat(n: int, iters: float) -> float:
    """FLOPs of one PCG solve in the FLAT lanes/sublanes layouts — same
    26 flops/cell/iter tally as stencil_pcg_flops but on the flat padded
    length n (the grid-plane X*Y figure overcounts the lane-padding cells
    the flat layouts never touch)."""
    return 26.0 * n * iters


def deflation_mxu_flops(n: int, m: int, iters: float) -> float:
    """bf16 MXU FLOPs of the two-level coarse correction per solve: two
    (n x m) matmul applications per iteration (ops/deflation.py; the m x m
    part is negligible)."""
    return 2.0 * 2.0 * n * m * iters


def stencil_pcg_vmem_bytes_per_sample(n: int, iters: float) -> float:
    """VMEM traffic per solve in the tiled kernels (ops/pcg_stencil.py
    lanes/sublanes layouts, symmetric 4-plane vals): each iteration touches
    ~11 full arrays (4 stored value planes + the 3 rolled vals*p products +
    Ap/x/r/p/z traffic; the flop count is unchanged at 26/cell/iter — the
    -o planes compute as rolls, not loads) of n x 4 bytes — i.e.
    11 * n * 4 * iters bytes attributable per sample. The kernel is
    VMEM-bandwidth-bound (measured ~2.2 TB/s effective), not VPU-bound."""
    return 11.0 * 4.0 * n * iters


def stencil_pcg_xla_bytes(grid_x: int, grid_y: int, iters: float) -> float:
    """HBM traffic the SAME algorithm moves when XLA lowers it (fem/solve.py
    jnp path): every iteration streams the 7 value planes + ~6 state vectors
    from/to HBM (~17 array passes x 4 bytes). The Pallas kernel holds all of
    it in VMEM — this figure is what fusing into VMEM *avoids*."""
    return 17.0 * 4.0 * grid_x * grid_y * iters


def rom_chain_step_flops(r: int, n_iters: int, d: int, m: int, hidden=(64, 64)) -> float:
    """FLOPs of one pCN chain step with the fused ROM+NN likelihood
    (one misfit evaluation: reduced PCG solve + QoI lift + MLP correction).

    solve_pcg (rom/galerkin.py): init ~16 r^2 (P0 warm start + residual),
    per iteration ~14 r^2 (5-component einsum 10r^2 + Mhat 2r^2 + P0 2r^2).
    Bhat lift 2 m r; MLP 2 * (d h1 + h1 h2 + h2 m); proposal/accept ~ O(d^2).
    """
    pcg = 16.0 * r * r + 14.0 * r * r * n_iters
    lift = 2.0 * m * r
    h1, h2 = hidden
    mlp = 2.0 * (d * h1 + h1 * h2 + h2 * m)
    proposal = 2.0 * d * d + 8.0 * d
    return pcg + lift + mlp + proposal


def pct(achieved: float, peak: float) -> float:
    return round(100.0 * achieved / peak, 2)

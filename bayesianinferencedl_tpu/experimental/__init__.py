"""Experimental: correctness-tested designs that LOSE to the production paths.

Modules here are complete, tested, and honestly measured — and the
measurements say the simpler production path wins (VERDICT.md round-1 item 6
/ weak item 6: "make it pay or demote it"). They are kept as the starting
point for the regimes where they would pay, with the measured crossover data
in each module docstring. Nothing in the production API imports from this
package.

- multigrid: geometric-MG flexible CG. Beats the fused Pallas Jacobi-PCG
  kernel only in a narrow band around res=8 (~1.03k vs ~0.99k solves/s) and
  loses at res>=16 because the masked fin domain degrades the coarse-grid
  correction (iteration counts double per refinement instead of staying
  mesh-independent).
- pcn_fused: the whole pCN sampler as ONE Pallas kernel. Statistically exact
  but ~2x slower than the XLA scan at every compilable shape (C=1024), and
  Mosaic fails to compile it at C>=4096 where the XLA path reaches
  26.5M samples/s.
"""

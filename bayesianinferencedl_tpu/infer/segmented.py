"""Shared host-side segmentation driver for watchdog-safe MCMC dispatch.

Several runtimes kill any single device program that executes longer than
~a minute (CLAUDE.md rule 2), so every sampler whose hot loop contains a
full-order solve is dispatched as fixed-size segments: one compiled program
per segment (identical shapes — compiled once), with chain state and adapted
per-chain step sizes carried across segments so the result is
distributionally identical to one long run.

Every *_segmented sampler shares this loop. The subtle, easy-to-diverge part
is the ACCEPT/SWAP ACCOUNTING: each segment's result reports rates over only
its own post-burn steps, so the driver converts rates back to counts with a
per-segment factor, accumulates counts, and re-normalizes over the whole
post-burn run (this is where round-1's segment-local accept_rate bug and the
kept==1 swap half-count both lived — now fixed once, here).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# name -> (extract_rate(res), count_factor(kept), denominator(total_kept));
# count_factor must be the exact denominator the segment runner used, so
# rate * count_factor recovers the raw count.
RateSpec = Tuple[Callable[[Any], Any], Callable[[int], float], Callable[[int], float]]


def drive_segments(
    run_segment: Callable,
    carry: Any,
    key: jax.Array,
    *,
    n_steps: int,
    n_burn: int,
    segment: int,
    rates: Dict[str, RateSpec],
):
    """Run `run_segment(carry, key, n_steps, n_burn, start) -> (res, carry)`
    in fixed-size chunks; `start` is the GLOBAL step index of the segment's
    first step, so runners can keep their Robbins-Monro adaptation clock
    annealing across segments instead of restarting it (pass it through as
    adapt_t0). `res` must expose `.samples` (kept-major) and `.phi_trace`.
    Returns (last_res, carry, samples, phis, rates_out, total_kept) with
    samples/phis concatenated over all post-burn segments and rates_out
    covering the WHOLE post-burn run."""
    if n_steps <= 0:
        raise ValueError(f"drive_segments needs n_steps >= 1, got {n_steps}")
    done = 0
    total_kept = 0
    counts: Dict[str, Any] = {name: None for name in rates}
    s_chunks, p_chunks = [], []
    res = None
    while done < n_steps:
        this = min(segment, n_steps - done)
        key, sub = jax.random.split(key)
        burn = min(max(n_burn - done, 0), this)
        res, carry = run_segment(carry, sub, this, burn, done)
        kept = this - burn
        if kept > 0:
            for name, (get, count_factor, _) in rates.items():
                c = get(res) * count_factor(kept)
                counts[name] = c if counts[name] is None else counts[name] + c
            total_kept += kept
            s_chunks.append(np.asarray(res.samples))
            p_chunks.append(np.asarray(res.phi_trace))
        done += this
    samples = jnp.asarray(np.concatenate(s_chunks)) if s_chunks else res.samples
    phis = jnp.asarray(np.concatenate(p_chunks)) if p_chunks else res.phi_trace
    rates_out = {}
    for name, (get, _, denominator) in rates.items():
        rates_out[name] = (
            counts[name] / denominator(total_kept) if counts[name] is not None else get(res)
        )
    return res, carry, samples, phis, rates_out, total_kept


# the three accounting conventions used by the samplers ----------------------

def accept_rate_spec() -> RateSpec:
    """Per-step acceptance: segment rate = count / kept."""
    return (lambda r: r.accept_rate, lambda kept: kept, lambda total: max(total, 1))


def inner_accept_rate_spec(subchain: int) -> RateSpec:
    """Subchain acceptance: segment rate = count / (kept * subchain)."""
    return (
        lambda r: r.inner_accept_rate,
        lambda kept: kept * subchain,
        lambda total: max(total * subchain, 1),
    )


def swap_rate_spec() -> RateSpec:
    """Adjacent-pair swaps are proposed every other step: segment rate =
    count / max(kept / 2, 1) (the same denominator run_pt_* uses)."""
    return (
        lambda r: r.swap_rate,
        lambda kept: max(kept / 2, 1),
        lambda total: max(total / 2, 1),
    )

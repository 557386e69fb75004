"""Headline benchmark (BASELINE.md): full Bayesian inversion throughput.

Runs the end-to-end pipeline (FOM -> POD ROM -> NN error surrogate) and then
times the production MCMC. The headline sampler is parallel-tempered pCN
(infer/tempering.py): at 1e-3 observation noise the fin posterior is
genuinely multimodal (measured: a mis-assigned subfin configuration fits the
data better than the truth under the FOM itself), so single-temperature pCN
chains park in different basins and R-hat ~ 2 no matter how long they run —
PT is the exact sampler for that posterior, and the R-hat gate below is the
convergence evidence (VERDICT.md round-1 item 2).

INCREMENTAL + BUDGET-AWARE (VERDICT r3 item 1 — round 3's driver capture
timed out with zero output because the old bench printed exactly once, at
the very end) + COMPACT (VERDICT r4 item 1 — round 4's driver capture was
rc=0 but unparsed: the full-record line had grown to ~6.2 KB while the
driver parses only the LAST 2000 characters of stdout):

- After EVERY completed block a COMPACT summary line (hard-capped at
  1800 chars, self-trimming — see Emitter.compact) is printed to stdout,
  and the FULL record is written to ``artifacts/bench_full_latest.json``.
  The driver parses the last stdout line; humans and sync_bench_docs.py
  read the full artifact. Lines before the PT headline carry
  ``"partial": true``.
- CARRY-FORWARD (VERDICT r4 item 3): blocks skipped by the budget (or
  failed fail-soft) pull their rows from the newest local full artifact,
  tagged ``"source": "carry:<path>"`` in the full record and listed under
  ``carry`` in the compact line — a budget-limited run records every
  layer with explicit provenance instead of silent gaps.
- PIPELINE CACHE (VERDICT r4 item 3): the offline build (basis + NN
  training, ~274 s in r4) is cached in
  ``artifacts/bench_pipeline_cache.npz`` keyed by the exact PipelineConfig;
  a cache hit reclaims ~4 min of the driver budget for measurement.
- A wall-clock budget (env ``BIDL_BENCH_BUDGET_S``, default 900 s) gates
  every block: a block whose cost estimate exceeds the remaining budget is
  recorded as ``{"skipped": "budget"}`` and the bench moves on. Blocks are
  ordered headline-first: pipeline build -> FOM/ROM+NN solve rates -> PT
  headline -> resolution scaling -> the sampler/approximation layer, most
  expensive last. Per-block cost estimates are the ROUND-4 MEASURED walls
  (artifacts/bench_r4_local.json detail.blocks; tunnel variance runs
  ~+-25-40%, so the 900 s default covers the VERDICT-required rows —
  headline+R-hat, FOM xla/pallas/b4096, rom_nn, res8/16 — even on a slow
  tunnel day; BIDL_BENCH_BUDGET_S=2400 captures every block).
- Per-block wall clock + status stream to stderr and land in
  ``detail.blocks``, so a timeout is diagnosable from the tail alone.

Also reports (VERDICT items 3-5): batched FOM solves/s through BOTH the XLA
path and the fused Pallas PCG kernel, a resolution-scaling table for the
kernel, and roofline/MFU accounting against v5e peaks (utils/roofline.py).

The last line printed is the record:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

vs_baseline is measured against the reference north-star rate (BASELINE.json:
1e4 pCN samples in < 60 s => 166.7 samples/sec) since the reference repo
recorded no published numbers (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BIDL_BENCH_BUDGET_S", "900"))
# BIDL_BENCH_SMOKE=1: shrink every size so the WHOLE control flow (emission,
# budget gating, every block body) runs in minutes on CPU — a correctness
# rehearsal for the driver run, never a performance measurement. The Pallas
# blocks fail-soft off-TPU, which the emitter is designed to tolerate.
SMOKE = os.environ.get("BIDL_BENCH_SMOKE", "") not in ("", "0")


def _elapsed() -> float:
    return time.perf_counter() - T0


def _log(msg: str) -> None:
    print(f"[bench +{_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def _readback(out):
    """Force a device->host read of (a reduction of) out. block_until_ready
    alone is NOT a reliable completion barrier over this environment's remote
    tunnel for repeated identical dispatches (measured up to 80x inflation) —
    a scalar readback is (CLAUDE.md timing rule)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _timed(fn, *args, fresh=None, reps=3):
    """Compile (first call), then time `reps` steady-state calls and keep the
    best, each with a forced readback and FRESH arguments (fresh: thunk
    taking the repeat index) so no timed dispatch is identical to a previous
    one (CLAUDE.md timing rule). Best-of-N because single dispatches over
    the remote tunnel carry multi-tens-of-ms jitter that is queueing, not
    kernel time (measured 2.3x spread on identical programs)."""
    out = fn(*args)
    _readback(out)
    best = float("inf")
    for i in range(reps):
        if fresh is not None:
            args = fresh(i)
        t0 = time.perf_counter()
        out = fn(*args)
        _readback(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


ART_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
FULL_RECORD_PATH = os.path.join(ART_DIR, "bench_full_latest.json")
# newest complete local artifact — the carry-forward source for blocks the
# budget skips (override with BIDL_BENCH_CARRY=path or "" to disable)
CARRY_SRC = os.environ.get(
    "BIDL_BENCH_CARRY", os.path.join(ART_DIR, "bench_r5_run2.json")
)

# block name -> the detail keys that block owns (for carry-forward)
BLOCK_DETAIL_KEYS = {
    "build_pipeline": ("rom_rel_err", "corrected_rel_err", "rel_err_eval"),
    "fom_solves": (
        "fom_solves_per_sec_xla",
        "fom_solves_per_sec_pallas",
        "fom_solves_per_sec_pallas_b4096",
    ),
    "rom_nn_solves": ("rom_nn_solves_per_sec",),
    "resolution_scaling": ("resolution_scaling",),
    "pcn_single_temp": ("pcn_single_temp",),
    "laplace_mh": ("laplace_mh",),
    "mala_lap": ("mala_lap",),
    "da_fom": ("da_fom_exact",),
    "eki": ("eki",),
    "vi_advi": ("vi",),
    "svgd": ("svgd",),
    "flow_neutra": ("flow_neutra",),
}

# compact-line keys dropped (in order) if the line would exceed the cap
COMPACT_DROP_ORDER = (
    "approx", "blocks", "roofline", "res", "single_temp", "carry",
)
COMPACT_MAX_CHARS = 1800  # driver captures the last 2000 chars of stdout


class Emitter:
    """Owns the result dict. After each block: writes the FULL record to
    artifacts/bench_full_latest.json and prints a COMPACT (<=1800 char,
    self-trimming) summary line to stdout — the driver parses only the
    last ~2000 stdout chars (VERDICT r4 item 1; BENCH_r04 parsed=null)."""

    def __init__(self):
        self.detail = {
            "bench_budget_s": BUDGET_S,
            "blocks": {},
        }
        self.metric = "fom_solves_per_sec_pallas_b4096"
        self.value = None
        self.unit = "solves/sec"
        self.vs_baseline = None
        self.partial = True
        self.carried = set()  # cumulative across emits
        try:
            with open(CARRY_SRC) as f:
                self.carry_detail = json.load(f).get("detail", {})
        except Exception:
            self.carry_detail = {}

    def _apply_carries(self):
        """For every block that ended skipped/failed, fill its detail keys
        from the carry artifact (full record gets the values + a source
        tag; the compact line lists the block under ``carry``)."""
        for name, status in self.detail["blocks"].items():
            if "skipped" not in status and "error" not in status:
                continue
            for key in BLOCK_DETAIL_KEYS.get(name, ()):
                if key in self.detail or key not in self.carry_detail:
                    continue
                val = self.carry_detail[key]
                if isinstance(val, dict):
                    val = {**val, "source": f"carry:{os.path.relpath(CARRY_SRC, os.path.dirname(ART_DIR))}"}
                self.detail[key] = val
                self.carried.add(key)
        return self.carried

    def full_record(self):
        out = {
            "metric": self.metric,
            "value": self.value,
            "unit": self.unit,
            "vs_baseline": self.vs_baseline,
            "detail": self.detail,
        }
        if self.partial:
            out["partial"] = True
        return out

    def compact(self, carried):
        """The stdout line: headline + the VERDICT-required rows, trimmed
        to COMPACT_MAX_CHARS by dropping optional sections."""
        d = self.detail

        def sub(src, keymap):
            if not isinstance(src, dict):
                return None
            out = {new: src[old] for new, old in keymap.items() if old in src}
            return out or None

        cd = {
            "budget_s": BUDGET_S,
            "elapsed_s": d.get("bench_elapsed_s"),
            "backend": d.get("backend"),
            "full_record": "artifacts/bench_full_latest.json",
        }
        if d.get("smoke"):
            cd["smoke"] = True
        for k in ("rom_rel_err", "corrected_rel_err"):
            if d.get(k) is not None:
                cd[k] = d[k]
        for new, old in (
            ("fom_xla", "fom_solves_per_sec_xla"),
            ("fom_pallas_b256", "fom_solves_per_sec_pallas"),
            ("fom_pallas_b4096", "fom_solves_per_sec_pallas_b4096"),
            ("rom_nn", "rom_nn_solves_per_sec"),
        ):
            if old in d:
                cd[new] = d[old]
        if "rhat_split_max" in d:  # PT headline landed
            cd["headline"] = {
                # compact line: first clause only (the full string lives in
                # the full record); keeps the line clear of the 1800 cap
                "deployed": (d.get("deployed_config") or "").split(" — ")[0],
                "rhat_split_max": d.get("rhat_split_max"),
                "rhat_ok": d.get("rhat_ok"),
                "ess_bulk_min": d.get("ess_bulk_min"),
                "ess_per_sec": d.get("ess_per_sec"),
                "wall_s_10k_steps": d.get("wall_seconds_10k_steps"),
                "accept_cold": d.get("accept_rate_cold"),
            }
        rs = d.get("resolution_scaling") or {}
        res = {
            k: v.get("fom_solves_per_sec_pallas")
            for k, v in rs.items() if isinstance(v, dict)
        }
        if res:
            cd["res"] = res
        st = sub(d.get("pcn_single_temp"), {
            "sps": "samples_per_sec", "ess_s": "ess_per_sec",
            "rhat": "rhat_split_max", "gate": "rhat_gate", "ok": "rhat_ok",
            "steps": "n_steps",
        })
        if st:
            cd["single_temp"] = st
        approx = {}
        for name, src, keymap in (
            ("laplace_mh", d.get("laplace_mh"), {"ess_s": "ess_per_sec", "rhat": "rhat_split_max"}),
            ("mala_lap", d.get("mala_lap"), {"ess_s": "ess_per_sec", "rhat": "rhat_split_max"}),
            ("da_fom", d.get("da_fom_exact"), {"ess_s": "ess_per_sec", "accept": "outer_accept", "rhat": "rhat_split_max"}),
            ("eki", d.get("eki"), {"err": "mean_abs_err_vs_pcn", "wall_s": "wall_seconds"}),
            ("vi", d.get("vi"), {"khat": "psis_k_hat", "err": "mean_abs_err_vs_pcn"}),
            ("svgd", d.get("svgd"), {"khat": "psis_k_hat_moment_matched", "err": "mean_abs_err_vs_pcn"}),
            ("flow_neutra", d.get("flow_neutra"), {"khat": "psis_k_hat"}),
        ):
            row = sub(src, keymap)
            if row is not None:
                approx[name] = row
        fn = d.get("flow_neutra") or {}
        if isinstance(fn.get("neutra"), dict) and "flow_neutra" in approx:
            approx["flow_neutra"]["nt_rhat"] = fn["neutra"].get("rhat_split_max")
            approx["flow_neutra"]["nt_ess_s"] = fn["neutra"].get("ess_per_sec")
        if approx:
            cd["approx"] = approx
        rl_ = d.get("roofline") or {}
        roof = sub(rl_, {
            "pcg_tflops": "pcg_kernel_tflops",
            "pcg_pct_vpu": "pcg_kernel_pct_vpu_peak",
            "chain_pct_mxu": "chain_step_pct_f32_mxu_peak",
        })
        if roof:
            cd["roofline"] = roof
        blocks = {}
        for name, status in self.detail["blocks"].items():
            if "error" in status:
                blocks[name] = "err"
            elif "skipped" in status:
                blocks[name] = "carry" if any(
                    k in carried for k in BLOCK_DETAIL_KEYS.get(name, ())
                ) else "skip"
            else:
                blocks[name] = f"{status['seconds']:.0f}s"
        cd["blocks"] = blocks
        if carried:
            cd["carry"] = {
                "keys": sorted(set(carried)),
                "src": os.path.basename(CARRY_SRC),
            }
        out = {
            "metric": self.metric,
            "value": self.value,
            "unit": self.unit,
            "vs_baseline": self.vs_baseline,
            "detail": cd,
        }
        if self.partial:
            out["partial"] = True
        line = json.dumps(out)
        for drop in COMPACT_DROP_ORDER:
            if len(line) <= COMPACT_MAX_CHARS:
                break
            cd.pop(drop, None)
            line = json.dumps(out)
        if len(line) > COMPACT_MAX_CHARS:  # last resort — never exceed cap
            out["detail"] = {"truncated": True, "full_record": cd["full_record"]}
            line = json.dumps(out)
        return line

    def emit(self):
        self.detail["bench_elapsed_s"] = round(_elapsed(), 1)
        carried = self._apply_carries()
        try:
            os.makedirs(ART_DIR, exist_ok=True)
            tmp = FULL_RECORD_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.full_record(), f, indent=1)
            os.replace(tmp, FULL_RECORD_PATH)
        except Exception as e:  # pragma: no cover - disk full etc.
            _log(f"full-record write failed: {e}")
        print(self.compact(carried), flush=True)

    def run(self, name: str, est_s: float, fn, *, required: bool = False) -> bool:
        """Run one block under the budget. Returns True iff it completed.
        Non-required blocks are fail-soft: an exception is recorded, not
        raised (remote-compile helper failures must not zero the artifact)."""
        remaining = BUDGET_S - _elapsed()
        if not required and remaining < est_s:
            _log(f"SKIP {name}: est {est_s:.0f}s > remaining {remaining:.0f}s")
            self.detail["blocks"][name] = {"skipped": "budget", "est_s": est_s}
            self.emit()
            return False
        _log(f"START {name} (est {est_s:.0f}s, remaining {remaining:.0f}s)")
        t0 = time.perf_counter()
        try:
            fn()
            self.detail["blocks"][name] = {"seconds": round(time.perf_counter() - t0, 1)}
            _log(f"DONE {name} in {time.perf_counter() - t0:.1f}s")
            ok = True
        except Exception as e:  # pragma: no cover - env-dependent
            if required:
                raise
            self.detail["blocks"][name] = {
                "seconds": round(time.perf_counter() - t0, 1),
                "error": str(e)[:300],
            }
            _log(f"FAIL {name}: {str(e)[:200]}")
            ok = False
        self.emit()
        return ok

    def skip(self, name: str, reason: str):
        """Record an explicitly-skipped block (advisor r4: dependency-gated
        blocks must self-document their absence like every other omission)."""
        _log(f"SKIP {name}: {reason}")
        self.detail["blocks"][name] = {"skipped": reason}
        self.emit()


def main() -> None:
    import dataclasses

    from bayesianinferencedl_tpu.api import build_pipeline, make_fom_solver, run_inversion
    from bayesianinferencedl_tpu.config import (
        FEMConfig,
        MCMCConfig,
        MeshConfig,
        PipelineConfig,
        ROMConfig,
        SurrogateConfig,
    )
    from bayesianinferencedl_tpu.fem.solve import solve_fom
    from bayesianinferencedl_tpu.models.five_param import FiveParamFin
    from bayesianinferencedl_tpu.ops.pcg_stencil import derived_maxiter, pick_layout
    from bayesianinferencedl_tpu.rom.snapshots import sample_log_uniform
    from bayesianinferencedl_tpu.utils import roofline as rl
    from bayesianinferencedl_tpu.utils.metrics import MetricsLogger

    em = Emitter()
    st: dict = {}  # cross-block state

    # adaptive 5-level ladder from the (5, 0.05) geometric start: burn-in
    # drives every adjacent pair's swap rate to the 0.234 target — the
    # adapted hottest level lands near lambda~0.004, 5x hotter than the
    # round-2 hand ladder's 0.02 floor, and that depth is what buys the
    # convergence margin. Measured on this exact config (fresh probes,
    # 2026-08-18): fixed (5,0.02) 10k steps -> split-R-hat 1.054; adaptive
    # 4-level 15k -> 1.054; adaptive 5-level 15k -> 1.039 with the best
    # min-bulk-ESS/s of the three (6.1k/s). 15k steps / 2k burn below for
    # the same reason (R-hat 1.072 -> 1.039 from 10k -> 15k at 5 levels).
    N_CHAINS, N_TEMPS, LAMBDA_MIN = 4096, 5, 0.05
    # production sizes vs smoke-rehearsal sizes (see SMOKE above)
    SZ = {
        "n_snapshots": 256, "r": 40, "n_train": 1024, "epochs": 300,
        "pt_steps": 15_000, "pt_burn": 2_000,
        "fom_batch": 256, "fom_batch_big": 4096,
        "st_chains": 8192, "st_steps": 30_000, "st_burn": 6_000, "st_thin": 4,
        "da_chains": 1024, "da_steps": 500, "da_burn": 150,
        "eki_ens": 1024, "vi_steps": 3000, "vi_mc": 32, "psis_draws": 4096,
        "svgd_particles": 512, "svgd_steps": 800,
        "flow_particles": 4096, "flow_steps": 3000, "flow_mutations": 8,
        "flow_stages": 256, "nt_steps": 10_000, "nt_burn": 2_000,
    }
    if SMOKE:
        N_CHAINS = 64
        SZ = {
            "n_snapshots": 64, "r": 16, "n_train": 128, "epochs": 40,
            "pt_steps": 600, "pt_burn": 200,
            "fom_batch": 32, "fom_batch_big": 64,
            "st_chains": 128, "st_steps": 600, "st_burn": 200, "st_thin": 1,
            "da_chains": 64, "da_steps": 60, "da_burn": 20,
            "eki_ens": 128, "vi_steps": 200, "vi_mc": 8, "psis_draws": 256,
            "svgd_particles": 64, "svgd_steps": 100,
            "flow_particles": 256, "flow_steps": 200, "flow_mutations": 2,
            "flow_stages": 16, "nt_steps": 400, "nt_burn": 100,
        }
    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=4),
        fem=FEMConfig(biot=0.1, cg_tol=1e-7, cg_maxiter=1500),
        # online_precision="high": 3-pass bf16x3 reduced solves — measured
        # 1.9x chain throughput over full-f32 with the surrogate trained on
        # the same path (posterior means agree to MC error, R-hat gate
        # unchanged). docs/DESIGN.md §4. Deployed iteration count is
        # max(15, r/2) = 20 here — the measured accuracy-vs-speed knee
        # (artifacts/iter_frontier_r4.json, summarized in detail below):
        # posterior mean error vs the exact-FOM pt_da posterior is 0.0012
        # at 20 iters vs 0.0011 at 30 (MC floor) and 0.013 at 15 (the
        # k-rough solver error the NN provably cannot learn), at 1.42x
        # 30-iter chain throughput (api.py build_pipeline).
        rom=ROMConfig(n_snapshots=SZ["n_snapshots"], basis_size=SZ["r"], online_precision="high"),
        surrogate=SurrogateConfig(hidden=(64, 64), n_train=SZ["n_train"], epochs=SZ["epochs"]),
        mcmc=MCMCConfig(
            n_chains=N_CHAINS, n_steps=SZ["pt_steps"], n_burn=SZ["pt_burn"], beta=0.25,
            noise_sigma=1e-3, likelihood="rom_nn", sampler="pt_pcn",
            n_temps=N_TEMPS, lambda_min=LAMBDA_MIN, adapt_ladder=True,
        ),
    )
    log = MetricsLogger()
    north_star_rate = 1e4 / 60.0  # BASELINE: 1e4 pCN samples in < 60 s
    em.detail["n_devices"] = jax.device_count()
    em.detail["backend"] = jax.default_backend()
    if SMOKE:
        em.detail["smoke"] = True  # rehearsal sizes — NOT a measurement

    def ks_batch(seed, n):
        return sample_log_uniform(jax.random.PRNGKey(seed), n).astype(jnp.float32)

    # --- pipeline build (required by every other block) ---------------------
    # Cached (VERDICT r4 item 3): the offline build burned 274 s (~30% of
    # the 900 s driver budget) in r4. Pipeline.save/load round-trips every
    # offline artifact; the cache key is the exact PipelineConfig dict, so
    # any size/precision change rebuilds. Holdout figures ride a sidecar.
    from bayesianinferencedl_tpu.api import Pipeline

    CACHE = os.path.join(ART_DIR, "bench_pipeline_cache.npz")

    def b_build():
        # compare in JSON space: to_dict() holds tuples, the reloaded meta
        # holds lists — a raw == always misses (measured 2026-08-20)
        want = json.loads(json.dumps(cfg.to_dict()))

        def build_key(cfgd):
            # offline-build-relevant projection: the basis + surrogate only
            # depend on mesh/fem/rom/surrogate/prior and mcmc.noise_sigma
            # (the online_iters auto-bump, api.build_pipeline) — an mcmc
            # sampler-knob change must NOT rebuild (the subchain default
            # change cost one spurious 192 s rebuild, measured 2026-08-20)
            key = {k: cfgd.get(k) for k in ("mesh", "fem", "rom", "surrogate", "prior")}
            key["noise_sigma"] = (cfgd.get("mcmc") or {}).get("noise_sigma")
            return key

        if os.path.exists(CACHE) and os.path.exists(CACHE + ".meta.json"):
            try:
                with open(CACHE + ".meta.json") as f:
                    side = json.load(f)
                if build_key(side.get("config") or {}) == build_key(want):
                    # the cached meta may carry a STALE mcmc section — pin
                    # this bench's config onto the loaded pipeline
                    pipe_c = dataclasses.replace(
                        Pipeline.load(CACHE, dtype=jnp.float32), config=cfg
                    )
                    st["pipe"] = pipe_c
                    em.detail["rom_rel_err"] = side["rom_rel_err"]
                    em.detail["corrected_rel_err"] = side["corrected_rel_err"]
                    em.detail["rel_err_eval"] = side["rel_err_eval"] + (
                        " [cached build: artifacts/bench_pipeline_cache.npz, "
                        f"built {side.get('built')} in {side.get('build_seconds')}s]"
                    )
                    em.detail["build_pipeline_cached"] = True
                    _log("pipeline cache HIT (config match)")
                    return
                _log("pipeline cache STALE (config changed) — rebuilding")
            except Exception as e:
                _log(f"pipeline cache unreadable ({e}) — rebuilding")
        t0 = time.perf_counter()
        st["pipe"] = build_pipeline(cfg, dtype=jnp.float32, metrics=log)
        build_s = round(time.perf_counter() - t0, 1)
        em.detail["rom_rel_err"] = log.summary().get("holdout_rel_err", {}).get("rom")
        em.detail["corrected_rel_err"] = log.summary().get("holdout_rel_err", {}).get("corrected")
        em.detail["rel_err_eval"] = "holdout (128 fresh draws; train-set figures in the metrics log)"
        if not SMOKE:
            try:
                import datetime

                st["pipe"].save(CACHE)
                with open(CACHE + ".meta.json", "w") as f:
                    json.dump({
                        "config": want,
                        "rom_rel_err": em.detail["rom_rel_err"],
                        "corrected_rel_err": em.detail["corrected_rel_err"],
                        "rel_err_eval": em.detail["rel_err_eval"],
                        "build_seconds": build_s,
                        "built": datetime.date.today().isoformat(),
                    }, f, indent=1)
                _log(f"pipeline cache SAVED ({build_s}s build)")
            except Exception as e:
                _log(f"pipeline cache save failed: {e}")

    em.run("build_pipeline", 30 if os.path.exists(CACHE) else 280, b_build, required=True)
    pipe = st["pipe"]

    # --- forward solves/sec: FOM via XLA AND via the fused Pallas kernel ----
    def b_fom_solves():
        B = SZ["fom_batch"]
        ks = ks_batch(3, B)
        fom_xla = jax.jit(
            jax.vmap(lambda k: pipe.fin.op.observe(solve_fom(pipe.fin.op, k, tol=1e-7, maxiter=1500)))
        )
        _, dt = _timed(fom_xla, ks, fresh=lambda i: (ks_batch(40 + i, B),))
        em.detail["fom_solves_per_sec_xla"] = round(B / dt, 2)

        pallas_solver = make_fom_solver(pipe.fin, tol=1e-7, maxiter=1500, use_pallas=True)
        _, dt = _timed(pallas_solver, ks, fresh=lambda i: (ks_batch(40 + i, B),))
        em.detail["fom_solves_per_sec_pallas"] = round(B / dt, 2)

        # the lane-tiled kernel's strong regime: samples on the 128-lane axis,
        # batch large enough to fill them (the dataset-generation regime)
        BB = SZ["fom_batch_big"]
        ks4k = ks_batch(5, BB)
        _, dt = _timed(pallas_solver, ks4k, fresh=lambda i: (ks_batch(60 + i, BB),))
        fom_sps_pallas_peak = BB / dt
        em.detail["fom_solves_per_sec_pallas_b4096"] = round(fom_sps_pallas_peak, 2)
        em.value = round(fom_sps_pallas_peak, 2)  # provisional until PT lands

        # kernel roofline: VPU stencil iterations + MXU deflation, all in
        # VMEM. Flat-layout flop tallies (the grid-plane X*Y figure would
        # overcount lane padding the lanes/sublanes layouts never touch).
        iters_solver = make_fom_solver(
            pipe.fin, tol=1e-7, maxiter=1500, use_pallas=True, with_iters=True
        )
        _, iters = iters_solver(ks4k)
        mean_iters = float(jnp.mean(iters))
        n_flat = pipe.fin.op.n
        pcg_achieved = rl.stencil_pcg_flops_flat(n_flat, mean_iters) * fom_sps_pallas_peak
        defl_m = pipe.fin.deflation_basis().m if iters_solver.deflated() else 0
        defl_mxu = rl.deflation_mxu_flops(n_flat, defl_m, mean_iters) * fom_sps_pallas_peak
        pcg_vmem_bw = rl.stencil_pcg_vmem_bytes_per_sample(n_flat, mean_iters) * fom_sps_pallas_peak
        pcg_hbm_avoided = 17.0 * 4.0 * n_flat * mean_iters * fom_sps_pallas_peak
        em.detail.setdefault("roofline", {}).update({
            "pcg_kernel_tflops": round(pcg_achieved / 1e12, 3),
            "pcg_kernel_pct_vpu_peak": rl.pct(pcg_achieved, rl.V5E_VPU_F32_FLOPS),
            "deflation_mxu_tflops": round(defl_mxu / 1e12, 4),
            "pcg_vmem_bw_tbps": round(pcg_vmem_bw / 1e12, 2),
            "pcg_kernel_mean_iters": round(mean_iters, 1),
            "pcg_hbm_traffic_avoided_gbps": round(pcg_hbm_avoided / 1e9, 1),
            "pcg_hbm_avoided_x_peak": round(pcg_hbm_avoided / rl.V5E_HBM_BYTES_PER_S, 2),
        })

    em.run("fom_solves", 100, b_fom_solves)

    # --- corrected-forward (ROM+NN) evals/sec -------------------------------
    def b_rom_nn():
        log_ks = jnp.log(ks_batch(3, SZ["fom_batch"]))
        big = jnp.tile(log_ks, (64, 1))  # 16384 corrected-forward evals
        corr_batch = jax.jit(jax.vmap(pipe.forward_fn("rom_nn")))
        _, dt = _timed(
            corr_batch, big,
            fresh=lambda i: (jnp.tile(jnp.log(ks_batch(40 + i, SZ["fom_batch"])), (64, 1)),),
        )
        em.detail["rom_nn_solves_per_sec"] = round(big.shape[0] / dt, 2)

    em.run("rom_nn_solves", 20, b_rom_nn)

    # --- the headline: parallel-tempered pCN, fused ROM+NN likelihood -------
    def b_pt_headline():
        inv = run_inversion(pipe, metrics=log)
        st["inv"] = inv
        kept_per_chain = inv.result.samples.shape[0]
        chain_steps_per_sec = kept_per_chain / inv.wall_seconds
        rhat_max = float(jnp.max(inv.rhat))
        # chain-step MFU: every step evaluates the fused likelihood once per
        # chain slot (n_temps x n_chains slots), f32 HIGHEST matmuls on MXU
        step_flops = rl.rom_chain_step_flops(
            r=cfg.rom.basis_size, n_iters=pipe.rom_pcg_iters, d=5,
            m=pipe.fin.op.n_obs, hidden=tuple(cfg.surrogate.hidden),
        )
        chain_achieved = step_flops * N_TEMPS * N_CHAINS * chain_steps_per_sec
        em.metric = "pt_pcn_samples_per_sec_rom_nn_4096chains"
        em.value = round(inv.samples_per_sec, 2)
        em.unit = "samples/sec"
        em.vs_baseline = round(inv.samples_per_sec / north_star_rate, 2)
        em.partial = False
        em.detail.update({
            # VERDICT r4 item 2/8: this block measures the pipeline AS
            # SHIPPED — build_pipeline's deployed default of max(15, r/2)
            # online reduced-PCG iterations (= 20 at r=40, the measured
            # accuracy knee, deployed in 96cea77 BEFORE the r4 local bench:
            # the r4 6.2M headline already measured it; r5 reproduces it to
            # tunnel noise, settling VERDICT r4 item 2 — the frontier's
            # 7.1M row was that sweep's own-setup throughput, not the
            # deployed pipeline's). History: r2 = 15 iters (7.74M, solver
            # error above noise), r3 = 30 iters (4.6M), r4+ = the 20-iter
            # knee (6.2M).
            "deployed_config": (
                f"{pipe.rom_pcg_iters} online reduced-PCG iters (bf16x3), "
                f"adaptive {N_TEMPS}-level ladder — the measured knee, "
                "deployed since 96cea77 (r4); r2/r3 headlines measured "
                "15/30 iters"
            ),
            "sampler": f"pt_pcn x{N_TEMPS} temps, adaptive ladder (exact on the multimodal posterior)",
            "ladder_final_mean": [
                round(float(l), 4)
                for l in jnp.mean(inv.result.lambdas, axis=-1).tolist()
            ]
            if hasattr(inv.result, "lambdas")
            else None,
            "online_precision": "high (bf16x3 reduced solves; surrogate trained on the same path)",
            "chain_steps_per_sec": round(chain_steps_per_sec, 2),
            "wall_seconds_10k_steps": round(
                inv.wall_seconds * 10_000 / (cfg.mcmc.n_steps - cfg.mcmc.n_burn), 3
            ),
            # rank-normalized split estimators (Vehtari et al. 2021,
            # infer/diagnostics.py): split-R-hat max(bulk, tail) and bulk ESS
            # with the combined between-chain autocorrelation — the honest
            # figures on a tempered multimodal posterior
            "diag_estimators": "rank-normalized split R-hat + combined-chain bulk/tail ESS (Vehtari 2021)",
            "rhat_split_max": round(rhat_max, 4),
            "rhat_ok": bool(rhat_max < 1.05),
            "ess_bulk_min": round(float(jnp.min(inv.ess)), 1),
            "ess_tail_min": round(float(jnp.min(inv.ess_tail)), 1),
            "ess_per_sec": round(inv.ess_per_sec, 2),
            "accept_rate_cold": round(float(jnp.mean(inv.result.accept_rate[-1])), 3),
            "swap_rate": [round(float(s), 3) for s in inv.result.swap_rate],
        })
        em.detail.setdefault("roofline", {}).update({
            "chain_step_tflops": round(chain_achieved / 1e12, 3),
            "chain_step_pct_f32_mxu_peak": rl.pct(chain_achieved, rl.V5E_MXU_F32_FLOPS),
        })
        # measured 15/20/30-iter deployed-solve frontier backing the config
        # choice above (offline TPU sweep, scripts/iter_frontier.py — static
        # reference data, NOT re-measured in this run)
        try:
            fr = json.load(open(os.path.join(os.path.dirname(__file__), "artifacts", "iter_frontier_r4.json")))
            em.detail["iter_frontier"] = fr.get("summary", fr)
        except Exception:
            pass

    em.run("pt_headline", 290, b_pt_headline, required=True)
    inv = st["inv"]

    # --- resolution scaling of the deflated Pallas kernel (VERDICT r2 #1) ---
    def b_res_scaling():
        # round-2 reference rates (BENCH_r02.json), for the required >=3x check
        R02 = {8: 900.7, 16: 229.6}
        ks = ks_batch(3, 256)
        res_scaling = {}
        for res in (8, 16):
            fin_r = FiveParamFin.create(
                resolution=res, biot=0.1, dtype=jnp.float32, cg_tol=1e-7,
                cg_maxiter=derived_maxiter(res),
            )
            solver_r = make_fom_solver(
                fin_r, tol=1e-7, maxiter=derived_maxiter(res), use_pallas=True,
                with_iters=True,
            )
            (_, it_r), dt = _timed(solver_r, ks, fresh=lambda i: (ks_batch(40 + i, 256),))
            layout_r, tile_r = pick_layout(fin_r.op.n, 256, deflated=solver_r.deflated())
            rate = 256 / dt
            it_mean = float(jnp.mean(it_r))
            m_defl = fin_r.deflation_basis().m if solver_r.deflated() else 0
            n_r = fin_r.op.n
            vpu = rl.stencil_pcg_flops_flat(n_r, it_mean) * rate
            mxu = rl.deflation_mxu_flops(n_r, m_defl, it_mean) * rate
            res_scaling[f"res{res}"] = {
                "fom_solves_per_sec_pallas": round(rate, 2),
                "n_dof": fin_r.op.n_dof,
                "layout": f"{layout_r}:{tile_r} + deflation m={m_defl}",
                "speedup_vs_r02": round(rate / R02[res], 2),
                "mean_iters": round(it_mean, 1),
                # per-resolution roofline (VERDICT r2 item 1)
                "roofline": {
                    "stencil_vpu_tflops": round(vpu / 1e12, 3),
                    "pct_vpu_peak": rl.pct(vpu, rl.V5E_VPU_F32_FLOPS),
                    "deflation_mxu_tflops": round(mxu / 1e12, 4),
                    "pct_mxu_bf16_peak": rl.pct(mxu, rl.V5E_MXU_BF16_FLOPS),
                    "vmem_bw_tbps": round(
                        rl.stencil_pcg_vmem_bytes_per_sample(n_r, it_mean) * rate / 1e12, 2
                    ),
                },
            }
            em.detail["resolution_scaling"] = res_scaling
            em.emit()  # res8 lands even if res16's compile blows the clock

    em.run("resolution_scaling", 195, b_res_scaling)

    # --- single-temperature pCN throughput (unimodal 1e-2 regime) -----------
    # the raw chain-step rate of the fused ROM+NN likelihood without the
    # tempering ladder — benched where single-temp pCN actually converges.
    # 30k steps (VERDICT r4 item 4: 3k left split-R-hat 1.075, 10k left
    # 1.023 — still above the repo's own 1.01 gate; sampling at ~31M
    # samples/s is ~8 s of the block's ~260 s wall, which is nearly all
    # compile, so tripling the steps costs seconds and the number must
    # finally pass its own gate or be demoted from the README headline).
    # thin=4 keeps the KEPT sample storage at 6k x 8192 x 5 f32 (~1 GB):
    # the unthinned 30k run OOM'd the chip (24k kept = 3.9 GB + the
    # rank-normalized diagnostics' sort copies, measured 2026-08-20) and
    # the ResourceExhausted poisoned every later block. Thinning only
    # discards storage — the chain-step rate is unchanged, so the raw
    # samples/s figure is kept*thin/wall, reported alongside the kept rate.
    def b_single_temp():
        cfg_st = dataclasses.replace(
            cfg,
            mcmc=dataclasses.replace(
                cfg.mcmc, sampler="pcn", n_chains=SZ["st_chains"],
                n_steps=SZ["st_steps"], n_burn=SZ["st_burn"], noise_sigma=1e-2,
                thin=SZ["st_thin"],
            ),
        )
        inv_st = run_inversion(dataclasses.replace(pipe, config=cfg_st), metrics=log)
        st["inv_st"] = inv_st
        st["cfg_st"] = cfg_st
        rhat_st = float(jnp.max(inv_st.rhat))
        em.detail["pcn_single_temp"] = {
            "regime": "unimodal (noise 1e-2; at 1e-3 single-temp chains strand in basins — use pt_pcn)",
            "n_chains": SZ["st_chains"],
            "n_steps": SZ["st_steps"],
            "thin": SZ["st_thin"],
            "rate_note": "samples_per_sec = raw chain samples (kept x thin)/wall; storage thinned to fit HBM",
            "kept_samples_per_sec": round(inv_st.samples_per_sec, 2),
            "samples_per_sec": round(inv_st.samples_per_sec * SZ["st_thin"], 2),
            "ess_per_sec": round(inv_st.ess_per_sec, 2),
            "ess_tail_min": round(float(jnp.min(inv_st.ess_tail)), 1),
            "rhat_split_max": round(rhat_st, 4),
            "rhat_gate": 1.01,
            "rhat_ok": bool(rhat_st < 1.01),
        }

    em.run("pcn_single_temp", 270, b_single_temp)

    # --- effective-sample rate with the Laplace-proposal sampler ------------
    # benched at 1e-2 noise, where the posterior is unimodal and the
    # independence-sampler assumptions hold. At the headline 1e-3 noise the
    # posterior is multimodal and laplace_mh is single-basin-biased
    # (docs/SAMPLERS.md) — a clean R-hat there would only mean every chain
    # sits in the same basin (VERDICT r2 weak-1).
    cfg_mh = dataclasses.replace(cfg, mcmc=dataclasses.replace(cfg.mcmc, noise_sigma=1e-2))

    def b_laplace_mh():
        inv_mh = run_inversion(
            dataclasses.replace(pipe, config=cfg_mh), sampler="laplace_mh", metrics=log
        )
        em.detail["laplace_mh"] = {
            "regime": "unimodal (noise 1e-2; single-basin-biased at the 1e-3 multimodal regime — docs/SAMPLERS.md)",
            "ess_per_sec": round(inv_mh.ess_per_sec, 2),
            "ess_bulk_min": round(float(jnp.min(inv_mh.ess)), 1),
            "ess_tail_min": round(float(jnp.min(inv_mh.ess_tail)), 1),
            "rhat_split_max": round(float(jnp.max(inv_mh.rhat)), 4),
        }

    em.run("laplace_mh", 150, b_laplace_mh)

    # --- gradient-based sampler: Laplace-preconditioned MALA ----------------
    # same unimodal 1e-2 config as laplace_mh for comparability; each step is
    # one fused forward+reverse pass of the rom_nn likelihood (infer/mala.py).
    def b_mala():
        inv_mala = run_inversion(
            dataclasses.replace(pipe, config=cfg_mh), sampler="mala_lap", metrics=log
        )
        em.detail["mala_lap"] = {
            "regime": "unimodal (noise 1e-2; gradient-based — exact on non-Gaussian unimodal posteriors where the independence sampler mixes poorly)",
            "sampler": "Laplace-preconditioned MALA (one fused forward+reverse rom_nn pass per step)",
            "samples_per_sec": round(inv_mala.samples_per_sec, 2),
            "ess_per_sec": round(inv_mala.ess_per_sec, 2),
            "ess_bulk_min": round(float(jnp.min(inv_mala.ess)), 1),
            "ess_tail_min": round(float(jnp.min(inv_mala.ess_tail)), 1),
            "rhat_split_max": round(float(jnp.max(inv_mala.rhat)), 4),
            "accept_rate": round(float(jnp.mean(inv_mala.result.accept_rate)), 3),
        }

    em.run("mala_lap", 205, b_mala)

    # --- delayed acceptance: the EXACT full-order posterior -----------------
    # rom_nn subchains (the DEPLOYED default length — r5 frontier
    # artifacts/da_frontier_r5.json: S=64 is 10x S=8's ESS/s because one
    # batched FOM correction costs ~75x a coarse step; the config comment
    # has the full ladder) + one batched Pallas FOM correction per outer
    # step; same artifacts, unimodal 1e-2-noise regime (the multimodal 1e-3
    # case needs the tempered variant — artifacts/ptda_fom_1e3noise.json)
    def b_da_fom():
        cfg_da = dataclasses.replace(
            cfg,
            mcmc=dataclasses.replace(
                cfg.mcmc, n_chains=SZ["da_chains"], n_steps=SZ["da_steps"],
                n_burn=SZ["da_burn"], noise_sigma=1e-2,
                likelihood="fom", sampler="da_pcn",
            ),
        )
        inv_da = run_inversion(dataclasses.replace(pipe, config=cfg_da), metrics=log)
        em.detail["da_fom_exact"] = {
            "sampler": f"da_pcn (rom_nn subchains x{cfg_da.mcmc.subchain} + exact FOM correction; deployed default, r5 frontier)",
            "ess_per_sec": round(inv_da.ess_per_sec, 2),
            "ess_bulk_min": round(float(jnp.min(inv_da.ess)), 1),
            "ess_tail_min": round(float(jnp.min(inv_da.ess_tail)), 1),
            "rhat_split_max": round(float(jnp.max(inv_da.rhat)), 4),
            "outer_accept": round(float(jnp.mean(inv_da.result.accept_rate)), 3),
            "outer_steps_per_sec": round(
                inv_da.result.samples.shape[0] / inv_da.wall_seconds, 2
            ),
            # solver-iteration audit over kept chain states (VERDICT r2
            # item 7): hit_cap_frac > 0 would mean unconverged solves
            # biased the chain
            "fom_iter_audit": {
                "cap": inv_da.fom_iter_cap,
                "max_iters": inv_da.fom_iter_max,
                "hit_cap_frac": inv_da.fom_hit_cap_frac,
            },
        }

    em.run("da_fom", 260, b_da_fom)

    # --- derivative-free EKI: the fast first look (unimodal 1e-2 regime) ----
    # scored against the single-temperature pCN posterior on the SAME data
    def b_eki():
        from bayesianinferencedl_tpu.infer.eki import run_eki

        inv_st = st["inv_st"]
        fwd_eki = jax.jit(pipe.batched_forward_fn("rom_nn"))
        run_eki(fwd_eki, pipe.prior, inv_st.data, 1e-2,
                jax.random.PRNGKey(57), n_ensemble=SZ["eki_ens"])
        t0 = time.perf_counter()
        res_eki = run_eki(fwd_eki, pipe.prior, inv_st.data, 1e-2,
                          jax.random.PRNGKey(58), n_ensemble=SZ["eki_ens"])
        em.detail["eki"] = {
            "regime": "unimodal (noise 1e-2) — posterior APPROXIMATION; docs/SAMPLERS.md",
            "n_iters": len(res_eki.ts) - 1,
            "n_forward_evals": res_eki.n_forward,
            "wall_seconds": round(time.perf_counter() - t0, 3),
            "mean_abs_err_vs_pcn": round(float(jnp.mean(jnp.abs(
                res_eki.mean - inv_st.result.samples.mean(axis=(0, 1))))), 4),
        }

    if "inv_st" in st:
        em.run("eki", 20, b_eki)
    else:  # advisor r4: dependency-gated omissions must self-document
        em.skip("eki", "needs pcn_single_temp")

    # --- gradient-based VI (full-rank ADVI) + PSIS certification ------------
    # the same data as the pCN reference; the k-hat gate makes the
    # approximation's validity a measured number (infer/vi.py, infer/psis.py)
    def b_vi():
        from bayesianinferencedl_tpu.api import psis_certify, run_vi_inversion

        inv_st = st["inv_st"]
        pipe_st = dataclasses.replace(pipe, config=st["cfg_st"])
        run_vi_inversion(pipe_st, "rom_nn", n_steps=SZ["vi_steps"],
                         n_mc=SZ["vi_mc"], data=inv_st.data,
                         key=jax.random.PRNGKey(59))
        t0 = time.perf_counter()
        res_vi, _, _, _ = run_vi_inversion(
            pipe_st, "rom_nn", n_steps=SZ["vi_steps"], n_mc=SZ["vi_mc"],
            data=inv_st.data, key=jax.random.PRNGKey(60),
        )
        vi_wall = time.perf_counter() - t0
        cert = psis_certify(
            pipe_st, res_vi.theta_mean, res_vi.theta_chol, inv_st.data,
            "rom_nn", n_draws=SZ["psis_draws"], key=jax.random.PRNGKey(61),
        )
        em.detail["vi"] = {
            "regime": "unimodal (noise 1e-2) — posterior APPROXIMATION; docs/SAMPLERS.md",
            "rank": "full",
            "n_forward_evals": res_vi.n_forward,
            "wall_seconds": round(vi_wall, 3),
            "mean_abs_err_vs_pcn": round(float(jnp.mean(jnp.abs(
                res_vi.theta_mean - inv_st.result.samples.mean(axis=(0, 1))))), 4),
            "psis_k_hat": round(cert.k_hat, 3),
            "psis_reliable": bool(cert.reliable),
            "psis_ess": round(cert.ess, 1),
        }

    if "inv_st" in st:
        em.run("vi_advi", 130, b_vi)
    else:
        em.skip("vi_advi", "needs pcn_single_temp")

    # --- particle-transport SVGD (annealed) ---------------------------------
    # the nonparametric gradient-based member of the approximation layer
    # (infer/svgd.py), scored against the same pCN reference; the moment-
    # matched Gaussian is PSIS-certified (SVGD has no evaluable density)
    def b_svgd():
        import numpy as np

        from bayesianinferencedl_tpu.api import psis_certify, run_svgd_inversion

        inv_st = st["inv_st"]
        pipe_st = dataclasses.replace(pipe, config=st["cfg_st"])
        run_svgd_inversion(pipe_st, "rom_nn", n_particles=SZ["svgd_particles"],
                           n_steps=SZ["svgd_steps"], data=inv_st.data,
                           key=jax.random.PRNGKey(62))
        t0 = time.perf_counter()
        res_sv, _, _, _ = run_svgd_inversion(
            pipe_st, "rom_nn", n_particles=SZ["svgd_particles"],
            n_steps=SZ["svgd_steps"], data=inv_st.data,
            key=jax.random.PRNGKey(63),
        )
        svgd_wall = time.perf_counter() - t0
        ens = np.asarray(res_sv.particles, np.float64)
        cov_sv = np.cov(ens.T) + 1e-12 * np.eye(ens.shape[1])
        cert_sv = psis_certify(
            pipe_st, jnp.asarray(ens.mean(0), jnp.float32),
            jnp.asarray(np.linalg.cholesky(cov_sv), jnp.float32),
            inv_st.data, "rom_nn", n_draws=SZ["psis_draws"],
            key=jax.random.PRNGKey(64),
        )
        em.detail["svgd"] = {
            "regime": "unimodal (noise 1e-2) — posterior APPROXIMATION; docs/SAMPLERS.md",
            "n_particles": SZ["svgd_particles"],
            "n_forward_evals": res_sv.n_forward,
            "wall_seconds": round(svgd_wall, 3),
            "mean_abs_err_vs_pcn": round(float(jnp.mean(jnp.abs(
                res_sv.mean - inv_st.result.samples.mean(axis=(0, 1))))), 4),
            "psis_k_hat_moment_matched": round(cert_sv.k_hat, 3),
            "psis_reliable": bool(cert_sv.reliable),
        }

    if "inv_st" in st:
        em.run("svgd", 160, b_svgd)
    else:
        em.skip("svgd", "needs pcn_single_temp")

    # --- normalizing flow + NeuTra on the MULTIMODAL headline data ----------
    # the non-Gaussian approximation layer where it matters: same 1e-3
    # observations as the PT headline. SMC -> mass-covering MLE flow
    # (infer/flow.py), PSIS certification, then single-temperature
    # flow-preconditioned pCN — exact, converging where plain pCN strands.
    # The most expensive optional block, so it runs LAST under the budget.
    def b_flow():
        from bayesianinferencedl_tpu.api import (
            psis_certify_flow, run_flow_vi_inversion, run_neutra_inversion,
        )

        pt_mean = inv.result.samples.mean(axis=(0, 1))
        pt_std = inv.result.samples.reshape(-1, 5).std(axis=0)
        t0 = time.perf_counter()
        res_fl, _, _, _ = run_flow_vi_inversion(
            pipe, "rom_nn", n_couplings=6, hidden=32,
            pretrain_particles=SZ["flow_particles"],
            pretrain_steps=SZ["flow_steps"], n_mutations=SZ["flow_mutations"],
            max_stages=SZ["flow_stages"], theta_true=inv.theta_true, data=inv.data,
            key=jax.random.PRNGKey(62),
        )
        flow_wall = time.perf_counter() - t0
        cert_fl = psis_certify_flow(
            pipe, res_fl, inv.data, "rom_nn", n_draws=2 * SZ["psis_draws"],
            key=jax.random.PRNGKey(63),
        )
        inv_nt = run_neutra_inversion(
            pipe, res_fl, inv.data, "rom_nn", theta_true=inv.theta_true,
            n_chains=N_CHAINS, n_steps=SZ["nt_steps"], n_burn=SZ["nt_burn"],
            thin=4, key=jax.random.PRNGKey(64),
        )
        nt_samp = inv_nt.result.samples.reshape(-1, 5)
        em.detail["flow_neutra"] = {
            "regime": "MULTIMODAL (the 1e-3 headline data): SMC -> mass-covering MLE flow -> NeuTra (docs/SAMPLERS.md)",
            "fit_wall_seconds": round(flow_wall, 2),
            "fit_mean_abs_err_vs_pt": round(float(jnp.mean(jnp.abs(res_fl.theta_mean - pt_mean))), 4),
            "psis_k_hat": round(cert_fl.k_hat, 3),
            "psis_reliable": bool(cert_fl.reliable),
            "psis_corrected_mean_abs_err_vs_pt": round(float(jnp.mean(jnp.abs(jnp.asarray(cert_fl.mean) - pt_mean))), 4),
            "psis_log_evidence": round(cert_fl.log_evidence, 3),
            "pt_stepping_stone_log_evidence": (
                round(inv.log_evidence, 3) if inv.log_evidence is not None else None
            ),
            "neutra": {
                "sampler": "single-temperature flow-preconditioned pCN (exact; plain pCN strands at R-hat ~2 on this posterior)",
                "rhat_split_max": round(float(jnp.max(inv_nt.rhat)), 4),
                "ess_bulk_min": round(float(jnp.min(inv_nt.ess)), 1),
                "ess_per_sec": round(inv_nt.ess_per_sec, 2),
                "samples_per_sec": round(inv_nt.samples_per_sec, 1),
                "accept_rate": round(float(jnp.mean(inv_nt.result.accept_rate)), 3),
                "mean_abs_err_vs_pt": round(float(jnp.mean(jnp.abs(nt_samp.mean(0) - pt_mean))), 4),
                "std_ratio_vs_pt": [round(float(v), 3) for v in (nt_samp.std(0) / pt_std)],
            },
        }

    em.run("flow_neutra", 450, b_flow)

    _log(f"bench complete: {_elapsed():.1f}s of {BUDGET_S:.0f}s budget")
    em.emit()


if __name__ == "__main__":
    sys.exit(main())

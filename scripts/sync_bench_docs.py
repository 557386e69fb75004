"""Single source of truth for benchmark prose (VERDICT r2 item 6).

Reads a bench.py artifact JSON and rewrites the measured-performance blocks
in README.md / BASELINE.md between `<!-- BENCH:begin -->` /
`<!-- BENCH:end -->` markers. Every number in those blocks comes from the
named artifact — no hand-quoted throughput figures.

Hardened (advisor r4): every detail key is guarded — an artifact whose
fail-soft blocks errored, were budget-skipped without a carry source, or
were truncated still syncs, emitting "(not captured in this artifact)"
rows instead of crashing. Rows whose block was carried forward from an
older artifact (bench.py carry-forward) are annotated with their source.

Usage: python scripts/sync_bench_docs.py artifacts/bench_r5_local.json
Accepts a driver wrapper (BENCH_r*.json): follows parsed.detail.full_record
to the full artifact when the compact driver line lacks the detail rows.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MISSING = "(not captured in this artifact)"


def provenance(src):
    """One honest line naming the artifact and its capture status (VERDICT r3
    item 5): driver-captured records are BENCH_r*.json wrappers with an rc;
    anything else is a LOCAL builder measurement and says so."""
    import datetime

    path = os.path.join(REPO, src)
    date = datetime.date.fromtimestamp(os.path.getmtime(path)).isoformat()
    m = re.match(r"BENCH_r0*(\d+)\.json$", os.path.basename(src))
    if m:
        with open(path) as f:
            rc = json.load(f).get("rc")
        status = f"DRIVER-captured round-{int(m.group(1))} record (rc={rc})"
    else:
        status = (
            "LOCAL builder-run artifact, not a driver capture — the r3/r4 "
            "driver records landed unparsed (r3 rc=124 timeout; r4 rc=0 but "
            "the 6.2 KB final line overran the driver's 2000-char capture); "
            "bench.py now emits a compact final line so driver rounds "
            "re-verify these numbers"
        )
    return f"Source: `{src}`, captured {date} — {status}."


def fmt_m(x):
    if x >= 1e6:
        return f"{x / 1e6:.1f}M"
    if x >= 1e3:
        return f"{x / 1e3:.1f}k"
    return f"{x:.0f}"


def blk(d, key):
    """A block's dict iff it is present and not an error record; plus a
    carried-from annotation when bench.py filled it from an older artifact."""
    v = d.get(key)
    if not isinstance(v, dict) or "error" in v:
        return None, ""
    note = ""
    if isinstance(v.get("source"), str) and v["source"].startswith("carry:"):
        note = f" *(carried from `{v['source'][6:]}` — budget-skipped this run)*"
    return v, note


def st_gate(st):
    """Single-temp split-R̂ with its gate verdict spelled out (advisor r4:
    the generated docs must not under-report a known gate miss)."""
    if "rhat_split_max" not in st:
        return ""
    gate = st.get("rhat_gate")
    if gate is None:
        return f"split-R̂ {st['rhat_split_max']}"
    verdict = "passes" if st.get("rhat_ok") else "ABOVE"
    return f"split-R̂ {st['rhat_split_max']} ({verdict} its {gate} gate)"


def deployed_note(d):
    """The deployed-config transition stamp (VERDICT r4 item 8): the r4->r5
    default change (30 -> 20 online reduced-PCG iters, commit 96cea77) means
    the r5 headline measures a different — faster, equally accurate — config
    than the r2-r4 records; say so next to the number."""
    dep = d.get("deployed_config")
    if not dep:
        return []
    return [
        "",
        f"Deployed headline config: {dep}. (Headline shifts vs earlier rounds "
        "are this measured deployment, not tunnel variance — "
        "`artifacts/iter_frontier_r4.json`.)",
    ]


def readme_block(art, src):
    d = art["detail"]
    rl = d.get("roofline", {})
    rows = []
    if all(k in d for k in ("fom_solves_per_sec_pallas_b4096",
                            "fom_solves_per_sec_pallas", "fom_solves_per_sec_xla")):
        rows.append((
            "Batched FOM solves (fused Pallas deflated-CG, lane-tiled, whole CG in VMEM)",
            f"**{fmt_m(d['fom_solves_per_sec_pallas_b4096'])} solves/s** at batch 4096; "
            f"{fmt_m(d['fom_solves_per_sec_pallas'])} at batch 256 "
            f"(XLA path: {fmt_m(d['fom_solves_per_sec_xla'])})"))
    else:
        rows.append(("Batched FOM solves (fused Pallas deflated-CG)", MISSING))
    st, st_note = blk(d, "pcn_single_temp")
    rows.append((
        "Single-temperature pCN, ROM+NN likelihood (unimodal 1e-2-noise regime)",
        (f"**{fmt_m(st['samples_per_sec'])} samples/s** @ "
         f"{st['n_chains']} chains ({st_gate(st)}){st_note}")
        if st else MISSING))
    if "rhat_split_max" in d and art.get("value") is not None:
        rows.append((
            f"**Headline**: {d.get('sampler', 'pt_pcn')}, 4096 cold chains — the *converged* sampler on the multimodal 1e-3-noise posterior",
            f"**{fmt_m(art['value'])} samples/s**; 10k steps in "
            f"{d.get('wall_seconds_10k_steps', '?')} s; split-R̂ {d['rhat_split_max']}; "
            f"bulk-ESS {fmt_m(d['ess_bulk_min'])} ({fmt_m(d['ess_per_sec'])} ESS/s)"))
    else:
        rows.append(("**Headline**: PT-pCN on the multimodal 1e-3 posterior", MISSING))
    mh, mh_note = blk(d, "laplace_mh")
    rows.append((
        "Laplace-proposal independence MH (unimodal 1e-2 regime)",
        (f"**{fmt_m(mh['ess_per_sec'])} effective samples/s** "
         f"(split-R̂ {mh['rhat_split_max']}){mh_note}") if mh else MISSING))
    da, da_note = blk(d, "da_fom_exact")
    rows.append((
        "**Delayed acceptance** — the *exact* full-order posterior (ROM+NN subchains + batched Pallas FOM correction)",
        (f"**{fmt_m(da['ess_per_sec'])} ESS/s**, outer acceptance "
         f"{da['outer_accept']}, split-R̂ {da['rhat_split_max']}; "
         f"solver-iteration audit clean (hit_cap_frac "
         f"{da['fom_iter_audit']['hit_cap_frac']}){da_note}")
        if da and "fom_iter_audit" in da else MISSING))
    rows.append((
        "ROM+NN corrected forward evaluations",
        f"{fmt_m(d['rom_nn_solves_per_sec'])} solves/s"
        if "rom_nn_solves_per_sec" in d else MISSING))
    e, e_note = blk(d, "eki")
    if e:
        rows.append((
            "EKI (derivative-free posterior approximation, unimodal 1e-2 regime)",
            f"mean within {e['mean_abs_err_vs_pcn']} of the pCN reference in "
            f"{e['wall_seconds']} s ({e['n_forward_evals']} forward evals, "
            f"{e['n_iters']} tempering sweeps){e_note}",
        ))
    v, v_note = blk(d, "vi")
    if v:
        rows.append((
            "Full-rank ADVI + PSIS certification (unimodal 1e-2 regime)",
            f"mean within {v['mean_abs_err_vs_pcn']} of the pCN reference in "
            f"{v['wall_seconds']} s; PSIS k-hat {v['psis_k_hat']} "
            f"({'passes' if v['psis_reliable'] else 'FAILS'} the gate){v_note}",
        ))
    sv, sv_note = blk(d, "svgd")
    if sv:
        rows.append((
            "Annealed SVGD (particle-transport approximation, unimodal 1e-2 regime)",
            f"mean within {sv['mean_abs_err_vs_pcn']} of the pCN reference in "
            f"{sv['wall_seconds']} s ({sv['n_particles']} particles); "
            f"moment-matched PSIS k-hat {sv['psis_k_hat_moment_matched']} "
            f"({'passes' if sv['psis_reliable'] else 'FAILS'} the gate){sv_note}",
        ))
    f, f_note = blk(d, "flow_neutra")
    if f:
        rows.append((
            "Flow VI + NeuTra pCN on the MULTIMODAL 1e-3 headline data",
            f"flow fit {f['fit_wall_seconds']} s, PSIS-corrected mean within "
            f"{f['psis_corrected_mean_abs_err_vs_pt']} of the PT reference; "
            f"single-temperature NeuTra converges at split-R̂ "
            f"{f['neutra']['rhat_split_max']} "
            f"({fmt_m(f['neutra']['ess_per_sec'])} ESS/s) where plain pCN strands{f_note}",
        ))
    rs, rs_note = blk(d, "resolution_scaling")
    res_rows = [
        (f"Resolution scaling — res{r} ({v['n_dof']:,} dof, layout {v.get('layout', '?')})",
         f"{fmt_m(v['fom_solves_per_sec_pallas'])} FOM solves/s"
         + (f" ({v['speedup_vs_r02']}x round-2)" if "speedup_vs_r02" in v else "")
         + rs_note)
        for r, v in ((k[3:], v) for k, v in (rs or {}).items() if isinstance(v, dict))
    ]
    lines = [
        provenance(src),
        "All numbers below are that artifact's measurements",
        "(single v5e chip, fresh-input timing + forced readback; diagnostics are",
        "rank-normalized split R̂ / combined-chain bulk ESS — Vehtari et al. 2021).",
        "",
        "| Path | Rate |",
        "|---|---|",
    ]
    lines += [f"| {a} | {b} |" for a, b in rows + res_rows]
    lines += deployed_note(d)
    if rl.get("pcg_kernel_tflops") is None:
        return "\n".join(lines)
    lines += [
        "",
        f"Roofline (same artifact): fused-CG kernel {rl['pcg_kernel_tflops']} Tflop/s "
        f"({rl['pcg_kernel_pct_vpu_peak']}% of VPU f32 peak), "
        f"{rl['pcg_vmem_bw_tbps']} TB/s VMEM traffic, "
        f"{rl['pcg_hbm_avoided_x_peak']}x HBM-peak traffic avoided by keeping CG "
        f"state in VMEM" + (
            f"; chain step {rl['chain_step_tflops']} Tflop/s "
            f"({rl['chain_step_pct_f32_mxu_peak']}% of f32-MXU peak)."
            if "chain_step_tflops" in rl else "."),
    ]
    return "\n".join(lines)


def baseline_block(art, src):
    d = art["detail"]
    st, st_note = blk(d, "pcn_single_temp")
    mh, _ = blk(d, "laplace_mh")
    da, _ = blk(d, "da_fom_exact")
    rs, rs_note = blk(d, "resolution_scaling")
    headline_ok = "rhat_split_max" in d and art.get("value") is not None
    wall = d.get("wall_seconds_10k_steps")
    rows = [
        ("1e4 pCN samples, 5-param fin",
         (f"**{wall} s** for the converged tempered sampler ({d.get('sampler', 'pt_pcn')}) at 4096 chains "
          f"(split-R̂ {d['rhat_split_max']}) on ONE chip") if headline_ok and wall else MISSING,
         "< 60 s on v5e-8",
         f"✅ {60 / wall:.0f}x over on 1/8 hardware" if headline_ok and wall else "—"),
        ("MCMC samples/sec (ROM+NN)",
         (f"headline PT-pCN {fmt_m(art['value'])}/s" if headline_ok else MISSING)
         + (f"; single-temp pCN {fmt_m(st['samples_per_sec'])}/s "
            f"@{st.get('n_chains', 8192)} chains (1e-2 regime, {st_gate(st)}){st_note}"
            if st else ""),
         "figure of merit",
         f"{art['vs_baseline']:.0f}x the north-star rate" if headline_ok and art.get("vs_baseline") else "—"),
        ("MCMC effective samples/sec",
         (f"PT-pCN {fmt_m(d['ess_per_sec'])} bulk-ESS/s" if "ess_per_sec" in d else MISSING)
         + (f"; Laplace-MH {fmt_m(mh['ess_per_sec'])} (unimodal regime)" if mh else "")
         + (f"; DA-FOM {fmt_m(da['ess_per_sec'])} (exact FOM posterior)" if da else ""),
         "figure of merit", "—"),
        ("Forward solves/sec, FOM",
         (f"{fmt_m(d['fom_solves_per_sec_pallas_b4096'])} (fused Pallas, batch 4096); "
          f"{fmt_m(d['fom_solves_per_sec_pallas'])} at batch 256; XLA "
          f"{fmt_m(d['fom_solves_per_sec_xla'])}")
         if all(k in d for k in ("fom_solves_per_sec_pallas_b4096",
                                 "fom_solves_per_sec_pallas", "fom_solves_per_sec_xla"))
         else MISSING,
         "figure of merit", "—"),
        ("Forward solves/sec, ROM+NN",
         fmt_m(d["rom_nn_solves_per_sec"]) if "rom_nn_solves_per_sec" in d else MISSING,
         "figure of merit", "—"),
        ("Resolution scaling",
         ("; ".join(
             f"res{k[3:]}: {fmt_m(v['fom_solves_per_sec_pallas'])}/s"
             + (f" ({v['speedup_vs_r02']}x r2)" if "speedup_vs_r02" in v else "")
             for k, v in (rs or {}).items() if isinstance(v, dict)) + rs_note)
         if rs else MISSING,
         "no batching cliff at res>=8", "✅ sublane layout" if rs else "—"),
        ("ROM / corrected rel-err" + (" (holdout)" if "rel_err_eval" in d else ""),
         f"{d['rom_rel_err']:.2e} / {d['corrected_rel_err']:.2e}"
         if d.get("rom_rel_err") is not None and d.get("corrected_rel_err") is not None
         else MISSING,
         "corrected < rom",
         ("✅" if d["corrected_rel_err"] < d["rom_rel_err"] else "❌")
         if d.get("rom_rel_err") is not None and d.get("corrected_rel_err") is not None
         else "—"),
    ]
    lines = [
        provenance(src),
        "(See README for methodology.)",
        "",
        "| Metric | Measured | Gate | Status |",
        "|---|---|---|---|",
    ]
    lines += [f"| {a} | {b} | {c} | {e} |" for a, b, c, e in rows]
    lines += deployed_note(d)
    return "\n".join(lines)


def splice(path, block):
    with open(path) as f:
        text = f.read()
    pat = re.compile(r"<!-- BENCH:begin -->.*?<!-- BENCH:end -->", re.S)
    if not pat.search(text):
        raise SystemExit(f"{path}: no BENCH markers found")
    repl = f"<!-- BENCH:begin -->\n{block}\n<!-- BENCH:end -->"
    new = pat.sub(lambda m: repl, text)
    with open(path, "w") as f:
        f.write(new)
    print(f"synced {path}")


def load_artifact(src):
    """Resolve src to a full bench record. Driver wrappers ({"rc", "parsed"})
    hold the COMPACT line since r5 — follow its detail.full_record pointer
    to the full artifact when present and readable."""
    with open(os.path.join(REPO, src)) as f:
        art = json.load(f)
    if "detail" not in art:  # driver wrapper format {"parsed": {...}}
        art = art["parsed"]
        if art is None:
            raise SystemExit(f"{src}: driver record has parsed=null")
        full_rel = art.get("detail", {}).get("full_record")
        if full_rel:
            full_path = os.path.join(REPO, full_rel)
            if os.path.exists(full_path):
                with open(full_path) as f:
                    art = json.load(f)
                print(f"following {src} -> {full_rel}")
    return art


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "artifacts/bench_r5_local.json"
    art = load_artifact(src)
    splice(os.path.join(REPO, "README.md"), readme_block(art, src))
    splice(os.path.join(REPO, "BASELINE.md"), baseline_block(art, src))


if __name__ == "__main__":
    main()

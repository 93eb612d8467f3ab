#!/usr/bin/env python
"""Reference-scale training artifact on the real TPU chip (VERDICT r1 #4).

Trains the full configs/config.mag.json shape (~30k nodes, in=250,
hidden=500, heads [4,1], bs=128 groups x 32 candidates, expand_factor 50)
on a synthetic taxonomy with MAG-CS statistics — the stand-in for the
externally-hosted MAG-CS dump (reference README.md:104-128) — to early stop,
then evaluates the best checkpoint with test_fast.py and compares against
the simple_parent baseline on the same data.

Writes artifacts/MAG_SCALE_RUN.md (+ case study TSV); commit those.

    python scripts/reference_scale_run.py [--epochs 40] [--nodes 30000]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, env=None, timeout=7200):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=timeout)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-4000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"command failed ({r.returncode})")
    return r, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=30000)
    p.add_argument("--dim", type=int, default=250)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--device", default=None,
                   help="jax platform override (default: real TPU)")
    p.add_argument("--v2", action="store_true",
                   help="use the discriminative v2 synthetic benchmark "
                        "(cosine-to-parent is NOT an oracle; the trained "
                        "model is expected to WIN the baseline table)")
    p.add_argument("--noise", type=float, default=None,
                   help="generator noise override")
    p.add_argument("--readout", default=None,
                   help="readout override (e.g. CR)")
    p.add_argument("--raw-channel", dest="raw_channel", action="store_true",
                   help="enable the raw-feature channel "
                        "(arch.args.raw_channel)")
    p.add_argument("--negative_size", type=int, default=None)
    p.add_argument("--fve", type=int, default=1,
                   help="full-catalog validation every K epochs (0 = "
                        "sampled validation only; default 1 — the sampled "
                        "monitor saturates by epoch 2, VERDICT r4 weak #1)")
    args = p.parse_args()

    art = os.path.join(REPO, "artifacts")
    os.makedirs(art, exist_ok=True)
    data = os.path.join(
        REPO, "data",
        "synth_mag_cs_v2.pickle.bin" if args.v2 else
        "synth_mag_cs.pickle.bin")
    noise = args.noise if args.noise is not None else 1.0

    # 1. dataset with MAG-CS statistics (30k nodes, bushy DAG, 250-d feats)
    if not os.path.exists(data):
        run([sys.executable, "scripts/make_synthetic_dataset.py", "--out",
             data, "--nodes", str(args.nodes), "--dim", str(args.dim),
             "--max_children", "40", "--seed", "42", "--noise", str(noise)]
            + (["--v2"] if args.v2 else []))

    # 2. config: the mag shape on the synthetic data, production dtype/kernel
    cfg = json.load(open(os.path.join(REPO, "configs/config.mag.json")))
    for key in ("train_data_loader", "validation_data_loader",
                "test_data_loader"):
        cfg[key]["args"]["data_path"] = data
    cfg["arch"]["args"]["compute_dtype"] = "bfloat16"
    if args.readout:
        cfg["arch"]["args"]["readout_method"] = args.readout
    if args.raw_channel:
        cfg["arch"]["args"]["raw_channel"] = True
    if args.negative_size:
        cfg["train_data_loader"]["args"]["negative_size"] = \
            args.negative_size
    cfg["name"] = "TaxoExpan-MAG-scale-synthetic"
    cfg["trainer"].update(epochs=args.epochs,
                          full_validation_every=args.fve,
                          save_dir=os.path.join(art, "mag_scale_saved"))
    cfg_path = os.path.join(art, "config.mag_scale.json")
    json.dump(cfg, open(cfg_path, "w"), indent=2)

    dev = ["-d", args.device] if args.device else []

    # 3. train to early stop on the chip
    r_train, t_train = run([sys.executable, "train.py", "-c", cfg_path]
                           + dev, timeout=4 * 3600)
    log = r_train.stdout + r_train.stderr
    run_dirs = sorted(os.listdir(os.path.join(
        art, "mag_scale_saved", "models", cfg["name"])))
    best = os.path.join(art, "mag_scale_saved", "models", cfg["name"],
                        run_dirs[-1], "model_best.ckpt")

    # 4. evaluate best checkpoint + case study — twice: the first pass pays
    #    any remaining compile cost, the second measures the warm eval the
    #    VERDICT r2 #2 target (<=30 s at MAG scale) is about. Metrics must
    #    be identical across the two passes.
    case_tsv = os.path.join(art, "mag_scale_case_study.tsv")
    r_eval, t_eval = run([sys.executable, "test_fast.py", "-r", best,
                          "--case", case_tsv] + dev, timeout=3600)
    eval_out = r_eval.stdout + r_eval.stderr
    m = re.findall(r"\{[^{}]*'macro_mr'[^{}]*\}", eval_out)
    metrics = m[-1] if m else "(metrics line not found)"
    r_eval2, t_eval_warm = run([sys.executable, "test_fast.py", "-r", best]
                               + dev, timeout=3600)
    eval2_out = r_eval2.stdout + r_eval2.stderr
    m2 = re.findall(r"\{[^{}]*'macro_mr'[^{}]*\}", eval2_out)
    metrics_warm = m2[-1] if m2 else "(metrics line not found)"
    if metrics_warm != metrics:
        print("WARNING: warm-eval metrics differ from cold-eval metrics",
              file=sys.stderr)

    # 5. baselines on the same data: the quality table the trained model
    #    must top (VERDICT r4 #1) — simple_parent (cosine retrieval) plus
    #    the learned simple_MLP family (pair and DeepSet variants), run on
    #    CPU (per-step host loops are relay-hostile and these models are
    #    tiny)
    r_base, _ = run([sys.executable, "-m",
                     "taxoexpan_tpu.baselines.simple_parent", "--data",
                     data], timeout=1800)
    baseline = r_base.stdout.strip().splitlines()[-8:]
    mlp_blocks = []
    for kind in ("MLP", "DeepSetMLP"):
        r_mlp, _ = run([sys.executable, "-m",
                        "taxoexpan_tpu.baselines.simple_mlp", "--data",
                        data, "--model", kind, "--epochs", "5",
                        "--device", "cpu"], timeout=3600)
        mlp_blocks.append((kind, r_mlp.stdout.strip().splitlines()[-8:]))

    # 5b. the STRONGEST non-learned baseline: full simple_structure sweep
    #     (12 agg x beta configs); each metric reports the sweep's best
    #     value so the trained model is compared against the strongest
    #     claim any structure heuristic could make (VERDICT r4 #1/#7)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from taxoexpan_tpu.baselines import simple_structure
    from taxoexpan_tpu.data.taxonomy import Taxonomy
    q_metrics = ["macro_mr", "hit_at_1", "hit_at_3", "mrr_scaled_10"]
    taxo = Taxonomy.load(data)
    struct_best = {m: (float("inf") if m == "macro_mr" else 0.0)
                   for m in q_metrics}
    struct_cfg = {}
    for agg in ("sum", "mean", "min", "max"):
        for beta in (0.0, 0.25, 1.0):
            res_s = simple_structure.evaluate(taxo, agg=agg, beta=beta)
            for m in q_metrics:
                better = (res_s[m] < struct_best[m]) if m == "macro_mr" \
                    else (res_s[m] > struct_best[m])
                if better:
                    struct_best[m] = float(res_s[m])
                    struct_cfg[m] = f"{agg}/beta={beta}"

    model_vals = {k: float(v) for k, v in re.findall(
        r"'(\w+)': (?:np\.float64\()?([\d.eE+-]+)", metrics)}
    wins = [m for m in q_metrics
            if (model_vals.get(m, 1e18) <= struct_best[m]
                if m == "macro_mr"
                else model_vals.get(m, -1.0) >= struct_best[m])]
    losses = [m for m in q_metrics if m not in wins]

    # 6. throughput + epoch-time breakdown lines from the trainer log
    epochs_run = len(re.findall(r"\bloss\s*:", log)) or "?"
    steps = re.findall(r"edges_per_sec\s*:\s*([\d.e+]+)", log)
    egonets = [float(x) for x in
               re.findall(r"egonets_per_sec\s*:\s*([\d.e+]+)", log)]
    timings = re.findall(r"timing\s*:\s*(\{[^}]*\})", log)
    epoch_secs = [float(x) for x in
                  re.findall(r"epoch_seconds\s*:\s*([\d.e+]+)", log)]
    ckpt_secs = [float(x) for x in
                 re.findall(r"checkpoint_s\s*:\s*([\d.e+]+)", log)]

    with open(os.path.join(art, "MAG_SCALE_RUN.md"), "w") as f:
        f.write("# Reference-scale training artifact (synthetic MAG-CS"
                + (", v2 discriminative benchmark" if args.v2 else "")
                + ")\n\n")
        f.write(f"Generated by `scripts/reference_scale_run.py` on device "
                f"`{args.device or 'tpu (axon)'}`.\n\n")
        f.write(f"- dataset: {args.nodes} nodes, dim {args.dim}, "
                f"max_children 40, noise {noise}, seed 42 "
                + ("(synthetic_taxonomy_v2 — cosine-to-parent broken by "
                   "construction)" if args.v2 else "(synthetic_taxonomy)")
                + "\n")
        f.write(f"- config: {cfg_path} (config.mag.json shape, bf16, "
                f"kernel=auto"
                + (f", readout={args.readout}" if args.readout else "")
                + (", raw_channel" if args.raw_channel else "")
                + (f", negative_size={args.negative_size}"
                   if args.negative_size else "")
                + (f", full-catalog validation every {args.fve} epoch(s)"
                   if args.fve else ", sampled validation") + ")\n")
        f.write(f"- training wall-clock: {t_train:.0f} s "
                f"({epochs_run} epoch-logs), eval: cold {t_eval:.0f} s, "
                f"warm {t_eval_warm:.0f} s (metrics "
                f"{'identical' if metrics_warm == metrics else 'DIFFER'})\n")
        if steps:
            f.write(f"- last logged training throughput: {steps[-1]} "
                    f"edges/s (end-to-end epoch incl. host sampling)\n")
        if egonets:
            mid = egonets[1:] or egonets  # drop the compile-heavy 1st epoch
            f.write(f"- egonets/s per epoch: median {np.median(mid):.0f}, "
                    f"max {max(mid):.0f} (epoch 1 incl. compile: "
                    f"{egonets[0]:.0f})\n")
        f.write(f"\n## test_fast.py metrics (best checkpoint)\n\n"
                f"```\n{metrics}\n```\n")
        if timings or epoch_secs:
            f.write("\n## epoch-time breakdown (trainer timing log)\n\n"
                    "`wait_s` = consumer blocked on host sampler + H2D feed "
                    "thread; `dispatch_s` = async step dispatches; `sync_s` "
                    "= single epoch-end loss readback (device compute "
                    "drains here); `valid_s` = validation pass; "
                    "`checkpoint_s` = checkpoint write.\n\n```\n")
            for i, t in enumerate(timings):
                es = f" epoch_seconds={epoch_secs[i]:.1f}" \
                    if i < len(epoch_secs) else ""
                cs = f" checkpoint_s={ckpt_secs[i]:.1f}" \
                    if i < len(ckpt_secs) else ""
                f.write(f"epoch {i + 1}:{es} {t}{cs}\n")
            f.write("```\n")
        # ---- quality table: the claim the reference stakes (paper Table
        # 3; committed case studies README.md:115-122) with the honest
        # scope computed from the numbers, not asserted
        def parse_block(lines_b):
            vals = {}
            for ln in lines_b:
                mm = re.match(r"(\w+): ([\d.eE+-]+)", ln.strip())
                if mm:
                    vals[mm.group(1)] = float(mm.group(2))
            return vals

        parent_vals = parse_block(baseline)
        f.write("\n## Quality table (trained model vs baselines)\n\n")
        f.write("| model | " + " | ".join(q_metrics) + " |\n")
        f.write("|---|" + "---|" * len(q_metrics) + "\n")
        rows_q = [("**PGAT (this framework, trained)**", model_vals),
                  ("simple_structure (per-metric best of 12-config sweep)",
                   struct_best),
                  ("simple_parent (cosine retrieval)", parent_vals)]
        for kind, lines_b in mlp_blocks:
            rows_q.append((f"simple_MLP:{kind} (5 ep)",
                           parse_block(lines_b)))
        for label, vals in rows_q:
            cells = []
            for m in q_metrics:
                v = vals.get(m)
                if v is None:
                    cells.append("—")
                    continue
                best_all = all(
                    (v <= o.get(m, 1e18) if m == "macro_mr"
                     else v >= o.get(m, -1e18)) for _, o in rows_q)
                s = f"{v:.2f}" if m == "macro_mr" else f"{v:.3f}"
                cells.append(f"**{s}**" if best_all
                             and label.startswith("**") else s)
            f.write(f"| {label} | " + " | ".join(cells) + " |\n")
        if not losses:
            claim = ("**The trained model tops the table on every "
                     "headline metric** (macro_mr, hit@1, hit@3, "
                     "mrr_scaled_10) — including against the per-metric "
                     "best of the full simple_structure sweep.")
        else:
            claim = ("**Scope of the win**: the trained model wins "
                     + ", ".join(wins) + " but the structure sweep's "
                     "per-metric best still takes "
                     + ", ".join(losses) + " — the headline claim is "
                     "scoped to the metrics actually won.")
        f.write("\n" + claim + "\n")
        f.write("\nStructure-sweep winning configs per metric: "
                + ", ".join(f"{m}: {struct_cfg.get(m, '—')}"
                            for m in q_metrics) + ".\n")

        f.write("\n## Baselines on the same data\n\n### simple_parent "
                "(cosine retrieval)\n\n```\n"
                + "\n".join(baseline) + "\n```\n")
        for kind, lines_b in mlp_blocks:
            f.write(f"\n### simple_MLP:{kind} (5 epochs, cpu)\n\n```\n"
                    + "\n".join(lines_b) + "\n```\n")
        f.write(f"\n## case study\n\n`{os.path.basename(case_tsv)}` "
                f"(query, true parents, predicted top-10, rank), format of "
                f"the reference's case_studies TSV.\n")
        lines = [l for l in log.strip().splitlines()
                 if not l.startswith("DEBUG:")]
        tail = "\n".join(lines[-25:])
        f.write(f"\n## training log tail\n\n```\n{tail}\n```\n")
    print("artifact written to artifacts/MAG_SCALE_RUN.md")


if __name__ == "__main__":
    main()

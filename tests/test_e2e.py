"""End-to-end: self-supervised training on a synthetic taxonomy must beat
random ranking; checkpoints round-trip; the evaluation engine ranks all
candidates (the reference's empirical quality loop, SURVEY.md §4, made into an
automated test)."""
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from taxoexpan_tpu import builders
from taxoexpan_tpu.data.synthetic import synthetic_taxonomy
from taxoexpan_tpu.evaluation import TaxonomyRanker
from taxoexpan_tpu.train import Trainer, checkpoint as ckpt_mod
from taxoexpan_tpu.train.optim import PlateauScheduler

ARCH = {
    "args": {
        "propagation_method": "PGAT", "readout_method": "WMR",
        "matching_method": "LBM", "in_dim": 16, "hidden_dim": 32,
        "out_dim": 32, "pos_dim": 8, "num_layers": 1, "heads": [2, 1],
        "feat_drop": 0.1, "attn_drop": 0.1, "hidden_drop": 0.1,
        "out_drop": 0.1,
    }
}
LOADER_CFG = {"batch_size": 16, "negative_size": 7, "expand_factor": 8,
              "cache_refresh_time": 16, "normalize_embed": True,
              "num_workers": 0, "sampling_mode": 1, "shuffle": True}
VAL_CFG = {**LOADER_CFG, "sampling_mode": 0, "negative_size": 16,
           "shuffle": False}


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    save_dir = tmp_path_factory.mktemp("run")
    taxo = synthetic_taxonomy(num_nodes=400, dim=16, seed=3)
    train_sampler = builders.build_sampler(taxo, LOADER_CFG, "train")
    train_loader = builders.build_loader(train_sampler, LOADER_CFG)
    val_cfg = {**VAL_CFG, "max_parents": train_sampler.max_parents}
    val_sampler = builders.build_sampler(taxo, val_cfg, "validation")
    val_loader = builders.build_loader(val_sampler, val_cfg)

    model = builders.build_model(ARCH,
                                 max_parents=train_sampler.max_parents,
                                 expand_factor=train_sampler.expand_factor)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = builders.build_optimizer_from_config(
        {"type": "Adam", "args": {"lr": 5e-3, "amsgrad": True}},
        {"grad_clip": 5.0})
    opt_state = optimizer.init(params)
    config = {"arch": ARCH, "optimizer": {"type": "Adam"},
              "trainer": {"epochs": 12, "save_period": 1,
                          "monitor": "min val_macro_mr", "early_stop": 20}}
    trainer = Trainer(model, params, optimizer, opt_state,
                      loss_name="info_nce_loss",
                      metric_names=["macro_mr", "micro_mr", "hit_at_1",
                                    "hit_at_3", "mrr_scaled_10"],
                      feature_table=train_sampler.node_features,
                      train_loader=train_loader, valid_loader=val_loader,
                      config=config,
                      lr_scheduler=PlateauScheduler(mode="min", factor=0.5,
                                                    patience=3),
                      save_dir=save_dir)
    log = trainer.train()
    return dict(taxo=taxo, trainer=trainer, model=model, log=log,
                save_dir=save_dir, train_sampler=train_sampler)


def test_training_beats_random(trained):
    # validation groups have <= 1 + 16 candidates -> random macro_mr ~ 8.5
    val_mr = trained["log"]["val_macro_mr"]
    assert val_mr < 5.0, f"val_macro_mr={val_mr} did not beat random (~8.5)"
    assert trained["log"]["val_hit_at_1"] > 0.15


def test_loss_decreased(trained):
    assert trained["log"]["loss"] > 0


def test_checkpoints_written(trained):
    files = os.listdir(trained["save_dir"])
    assert "model_best.ckpt" in files
    assert any(f.startswith("checkpoint-epoch") for f in files)


def test_checkpoint_roundtrip(trained):
    path = os.path.join(trained["save_dir"], "model_best.ckpt")
    state = ckpt_mod.load_checkpoint(path)
    assert state["epoch"] >= 1
    t = trained["trainer"]
    params = ckpt_mod.restore_into(
        state, params_template=t.params, opt_state_template=t.opt_state)[0]
    # restored leaves match live best-epoch shapes
    live = jax.tree_util.tree_leaves(t.params)
    rest = jax.tree_util.tree_leaves(params)
    assert len(live) == len(rest)
    assert all(np.asarray(a).shape == np.asarray(b).shape
               for a, b in zip(live, rest))


def test_resume_continues(trained):
    t = trained["trainer"]
    ckpts = sorted(f for f in os.listdir(trained["save_dir"])
                   if f.startswith("checkpoint-epoch"))
    t.resume(os.path.join(trained["save_dir"], ckpts[-1]))
    assert t.start_epoch >= 2


def test_eval_engine(trained):
    taxo = trained["taxo"]
    test_cfg = {**VAL_CFG, "max_parents": trained["train_sampler"].max_parents}
    sampler = builders.build_sampler(taxo, test_cfg, "test")
    ranker = TaxonomyRanker(trained["model"], trained["trainer"].params,
                            sampler, sampler.node_features,
                            encode_chunk=128, query_chunk=32)
    result, cases = ranker.evaluate(
        ["macro_mr", "hit_at_1", "mrr_scaled_10"], rank_mode=1,
        case_study=True)
    n_cand = len(sampler.candidate_positions)
    # random macro_mr ~ n_cand / 2 (=180); trained must be far better
    assert result["macro_mr"] < n_cand / 4, (result, n_cand)
    assert result["mrr_scaled_10"] > 0.2
    assert len(cases) == len(sampler.node_list) + 1  # header + per query
    assert cases[0][0] == "Test node index"


def test_infer_predictions(trained):
    taxo = trained["taxo"]
    test_cfg = {**VAL_CFG, "max_parents": trained["train_sampler"].max_parents}
    sampler = builders.build_sampler(taxo, test_cfg, "test")
    ranker = TaxonomyRanker(trained["model"], trained["trainer"].params,
                            sampler, sampler.node_features,
                            encode_chunk=128, query_chunk=32)
    # "novel" terms = features of real test nodes -> top-5 should often
    # contain the true parent
    queries = sampler.node_list[:20]
    qf = sampler.node_features[np.asarray(queries)]
    preds = ranker.predict_parents(qf, rank_mode=1, topk=5)
    hits = sum(any(p in sampler.node2parents[q] for p in topk)
               for q, topk in zip(queries, preds))
    assert hits >= 1, "top-5 predictions never contained a true parent"


CLI_TIMEOUT = 600


@pytest.mark.slow
def test_cli_train_and_eval(tmp_path):
    """Drive the real CLI surface end to end on CPU."""
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # dataset
    data = tmp_path / "synth.pickle.bin"
    synthetic_taxonomy(num_nodes=300, dim=16, seed=5).save(str(data))
    cfg = json.load(open(os.path.join(repo, "configs/config.synthetic.json")))
    for key in ("train_data_loader", "validation_data_loader",
                "test_data_loader"):
        cfg[key]["args"]["data_path"] = str(data)
        cfg[key]["args"]["expand_factor"] = 8
    cfg["arch"]["args"].update(in_dim=16, hidden_dim=32, out_dim=32, pos_dim=8,
                               heads=[2, 1])
    cfg["trainer"].update(epochs=2, save_dir=str(tmp_path / "saved"))
    # exercise the "parallel" config surface end to end: the subprocess
    # inherits the 8-virtual-CPU-device XLA_FLAGS, so train.py builds a
    # dp=4 x mp=2 mesh (head-tensor-parallel GAT heads)
    cfg["parallel"] = {"mp": 2}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    r = subprocess.run(
        [sys.executable, "train.py", "-c", str(cfg_path), "-d", "cpu",
         "--bs", "16", "--ns", "7"],
        cwd=repo, env=env, capture_output=True, text=True,
        timeout=CLI_TIMEOUT)
    assert r.returncode == 0, r.stderr[-3000:]

    run_dirs = list((tmp_path / "saved" / "models" /
                     cfg["name"]).iterdir())
    assert run_dirs, "no run dir created"
    best = run_dirs[0] / "model_best.ckpt"
    assert best.exists()

    r2 = subprocess.run(
        [sys.executable, "test_fast.py", "-r", str(best), "-d", "cpu",
         "--case", str(tmp_path / "case.tsv")],
        cwd=repo, env=env, capture_output=True, text=True,
        timeout=CLI_TIMEOUT)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert (tmp_path / "case.tsv").exists()
    assert "macro_mr" in (r2.stdout + r2.stderr)

    # infer.py on novel terms (TSV `term \t space-separated-embedding`)
    taxo = synthetic_taxonomy(num_nodes=300, dim=16, seed=5)
    novel = tmp_path / "novel.tsv"
    with open(novel, "w") as f:
        for i in range(5):
            vec = " ".join(str(v) for v in taxo.features[i])
            f.write(f"new term {i}\t{vec}\n")
    r3 = subprocess.run(
        [sys.executable, "infer.py", "-r", str(best), "-d", "cpu",
         "--taxon", str(novel), "--save", str(tmp_path / "preds.tsv")],
        cwd=repo, env=env, capture_output=True, text=True,
        timeout=CLI_TIMEOUT)
    assert r3.returncode == 0, r3.stderr[-3000:]
    lines = (tmp_path / "preds.tsv").read_text().strip().splitlines()
    assert len(lines) == 6                      # header + 5 predictions
    assert lines[0] == "Query\tPredicted parents"
    assert lines[1].startswith("new_term_0\t")

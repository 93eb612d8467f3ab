"""Real-format preprocessing fixtures driven end-to-end (VERDICT r2 #5).

The reference's datasets were produced by notebooks run against external
dumps (data_preprocessing/*.ipynb, README.md:30-70); those dumps are not
downloadable here, so these tests commit miniature REAL-FORMAT fixtures
(tests/fixtures/mag_mini: a 9-column FieldsOfStudy.txt, a
FieldOfStudyChildren.txt edge list, a word2vec-text token embedding file)
and drive them through the full chain:

    preprocess_mag.py -> .terms/.taxo/.embed -> generate_dataset_binary
    (Taxonomy.from_raw_dir) -> train.py (2 epochs, CPU) -> test_fast.py
    (--case) -> scripts/parse_to_semeval_format.py

plus the WordNet path via stub synsets (preprocess_semeval's pure
build_taxonomy_files), closing the "never executed against real-format
inputs" caveat without the external downloads.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures", "mag_mini")


def _run(cmd, env_extra=None, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.update(env_extra or {})
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{cmd}:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r.stdout + r.stderr


@pytest.mark.slow
def test_mag_fixture_full_chain(tmp_path):
    out = tmp_path / "MAG_Mini"
    # 1. notebook-port preprocessing on the committed raw-format fixture
    log = _run(["scripts/preprocess_mag.py",
                "--fos", os.path.join(FIXTURES, "FieldsOfStudy.txt"),
                "--children", os.path.join(FIXTURES,
                                           "FieldOfStudyChildren.txt"),
                "--embed", os.path.join(FIXTURES, "tokens.vec"),
                "--root-name", "computer science",
                "--name", "mag_mini", "--out", str(out)])
    terms = dict(line.split("\t") for line in
                 (out / "mag_mini.terms").read_text().strip().splitlines())
    names = set(terms.values())
    assert "computer science" in names
    assert "biology" not in names            # subtree restriction applied
    assert "molecular biology" not in names
    assert "zzzzunembeddable" not in names   # missing-embedding drop
    edges = [tuple(line.split("\t")) for line in
             (out / "mag_mini.taxo").read_text().strip().splitlines()]
    assert all(a in terms and b in terms for a, b in edges)

    # 2. raw -> binary pickle (CLI surface)
    log = _run(["generate_dataset_binary.py", "-t", "mag_mini",
                "-d", str(out)])
    assert "Saved pickled dataset" in log
    data = out / "mag_mini.pickle.bin"
    assert data.exists()

    # 3. train 2 epochs on CPU through the real CLI
    cfg = json.load(open(os.path.join(REPO, "configs",
                                      "config.synthetic.json")))
    for key in ("train_data_loader", "validation_data_loader",
                "test_data_loader"):
        cfg[key]["args"]["data_path"] = str(data)
        cfg[key]["args"]["batch_size"] = 8  # divisible by the dp=8 mesh
        cfg[key]["args"]["negative_size"] = 3
        cfg[key]["args"]["expand_factor"] = 4
    cfg["arch"]["args"].update(in_dim=8, hidden_dim=8, out_dim=8, pos_dim=4)
    cfg["trainer"].update(epochs=2, save_dir=str(tmp_path / "saved"))
    cfg["name"] = "MagMini"
    cfg_path = tmp_path / "config.json"
    json.dump(cfg, open(cfg_path, "w"))
    log = _run(["train.py", "-c", str(cfg_path), "-d", "cpu"])
    assert "Finish training" in log
    runs = sorted((tmp_path / "saved" / "models" / "MagMini").iterdir())
    best = runs[-1] / "model_best.ckpt"
    assert best.exists()

    # 4. evaluate + case study through test_fast.py
    case = tmp_path / "case.tsv"
    log = _run(["test_fast.py", "-r", str(best), "-d", "cpu",
                "--case", str(case)])
    assert "macro_mr" in log
    rows = case.read_text().strip().splitlines()
    assert rows[0].startswith("Test node index")
    assert len(rows) > 1


def test_semeval_stub_corpus_chain(tmp_path):
    """WordNet path without nltk: stub synsets through the pure build step,
    then raw ingest and the SemEval submission converter."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from preprocess_semeval import build_taxonomy_files

    class Lemma:
        def __init__(self, n):
            self._n = n

        def name(self):
            return self._n

    class Syn:
        def __init__(self, name, lemma, definition="", hypo=()):
            self._name, self._lemma = name, lemma
            self._def, self._hypo = definition, list(hypo)

        def name(self):
            return self._name

        def lemmas(self):
            return [Lemma(self._lemma)]

        def definition(self):
            return self._def

        def hyponyms(self):
            return self._hypo

    dog = Syn("dog.n.01", "dog")
    cat = Syn("cat.n.01", "cat")
    # lemma token missing from the embed file -> falls back to definition
    pup = Syn("puppy.n.01", "zzznothere", definition="a young dog")
    # nothing embeddable at all -> dropped (and its edge with it)
    ghost = Syn("ghost.n.01", "zzznothere", definition="zzznothere")
    animal = Syn("animal.n.01", "animal", hypo=[dog, cat, ghost])
    dog._hypo = [pup]
    synsets = [animal, dog, cat, pup, ghost]

    rng = np.random.default_rng(0)
    tokens = ["animal", "dog", "cat", "a", "young"]
    vectors = rng.normal(size=(len(tokens), 6)).astype(np.float32)
    n_syn, n_edges = build_taxonomy_files(synsets, tokens, vectors,
                                          "wn_mini", str(tmp_path))
    assert n_syn == 4 and n_edges == 3       # ghost dropped

    from taxoexpan_tpu.data.taxonomy import Taxonomy
    taxo = Taxonomy.from_raw_dir("wn_mini", str(tmp_path))
    assert taxo.num_nodes == 4
    assert "dog.n.01" in " ".join(taxo.vocab)

    # converter chain: case-study rows built from this vocab's naming scheme
    case = tmp_path / "case.tsv"
    with open(case, "w") as f:
        f.write("Test node index\tTrue parents\tPredicted parents\n")
        f.write("test.7@@@9\tdog.n.01@@@1\tpuppy.n.01@@@3, cat.n.01@@@2\n")
    out = tmp_path / "submission.tsv"
    sub = subprocess.run(
        [sys.executable, "scripts/parse_to_semeval_format.py",
         "--input", str(case), "--output", str(out)],
        cwd=REPO, capture_output=True, text=True)
    assert sub.returncode == 0, sub.stderr
    line = out.read_text().strip().splitlines()[0].split("\t")
    assert line[0] == "7"
    assert line[1] == "puppy#n#1"
    assert line[2] == "attach"

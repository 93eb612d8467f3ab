"""Script-level tests: SemEval submission converter, synthetic dataset CLI."""
import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_to_semeval_format(tmp_path):
    mod = _load("semeval_fmt",
                os.path.join(REPO, "scripts/parse_to_semeval_format.py"))
    case = tmp_path / "case.tsv"
    case.write_text(
        "Test node index\tTrue parents\tPredicted parents\tmacro_mr\n"
        "test.42@@@7\tdog.n.01@@@3\tcanine.n.02@@@5, animal.n.01@@@1\t3.0\n")
    out = tmp_path / "sub.tsv"
    mod.main(str(case), str(out))
    line = out.read_text().strip().split("\t")
    assert line[0] == "42"
    assert line[1] == "canine#n#2"
    assert line[2] == "attach"


def test_make_synthetic_dataset_cli(tmp_path):
    out = tmp_path / "d.pickle.bin"
    r = subprocess.run(
        [sys.executable, "scripts/make_synthetic_dataset.py", "--out",
         str(out), "--nodes", "120", "--dim", "8"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    from taxoexpan_tpu.data.taxonomy import Taxonomy
    t = Taxonomy.load(str(out))
    assert t.num_nodes == 120

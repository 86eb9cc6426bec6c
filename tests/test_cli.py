import json

from lsbench_tpu.harness.bench import BenchRecord
from lsbench_tpu.harness.cli import main


def test_cli_runs_and_prints_csv(tiny_matrix_file, capsys):
    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "cg",
               "--trials", "3", "--json"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # Exact reference CSV schema (cusparse.c:207-209).
    assert out[0] == "===matrix,n,nnz,trials,solver,ordering,elapsed==="
    fields = out[1].split(",")
    assert fields[0] == str(tiny_matrix_file)
    assert fields[1:5] == ["5", "5", "3", "cg"]
    rec = json.loads(out[2])
    assert rec["converged"] is True
    assert rec["true_relres"] < 1e-8


def test_cli_invalid_solver_warns_and_defaults(tiny_matrix_file, capsys):
    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "nope",
               "--trials", "1"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Invalid solver" in captured.err
    assert BenchRecord.CSV_HEADER in captured.out


def test_cli_invalid_ordering_defaults_amd(tiny_matrix_file, capsys):
    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "cg",
               "--ordering", "zzz", "--trials", "1"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Defaulting to AMD" in captured.err
    assert ",amd," in captured.out


def test_cli_rejects_fp16(tiny_matrix_file, capsys):
    rc = main(["--matrix", str(tiny_matrix_file), "--precision", "fp16"])
    assert rc == 1

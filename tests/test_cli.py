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


def test_cli_mesh_2d(tiny_matrix_file, capsys):
    from lsbench_tpu.harness.cli import main
    import jax
    if jax.device_count() < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "cg",
               "--devices", "8", "--mesh", "2x4", "--trials", "2",
               "--rtol", "1e-10", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    import json as _json
    rec = _json.loads(out.strip().splitlines()[-1])
    assert rec["converged"]


def test_cli_scale_module(tiny_matrix_file, capsys):
    from lsbench_tpu.harness.scale import main
    rc = main(["--matrix", str(tiny_matrix_file), "--devices", "1,2",
               "--iters", "5", "--reps", "1", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "efficiency" in out and "1x1" in out


def test_cli_fp32_ir_gmres_and_ginkgo(tiny_matrix_file, capsys):
    # fp32_ir now covers the gmres and bicgstab families; the ginkgo alias
    # keeps its 1e-4 protocol params (ginkgo.cpp:59-62) through the remap.
    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "gmres",
               "--precision", "fp32_ir", "--trials", "1", "--json"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[2])
    assert rec["solver"] == "gmres_ir"
    assert rec["converged"] is True

    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "ginkgo",
               "--precision", "fp32_ir", "--trials", "1", "--json"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[2])
    assert rec["solver"] == "ginkgo"  # reported under the reference name
    assert rec["converged"] is True


def test_cli_fp32_ir_rejects_amg(tiny_matrix_file, capsys):
    rc = main(["--matrix", str(tiny_matrix_file), "--solver", "hypre",
               "--precision", "fp32_ir", "--trials", "1"])
    assert rc == 1
    assert "fp32_ir" in capsys.readouterr().err

"""CLI entrypoint (__main__.py): the ray-job-submit surface, incl. the
ADVICE r2 fix — --out with a pyarrow.Table result (color_breaks)."""

import json
import os

import pyarrow.parquet as pq


def _run(argv):
    import contextlib
    import io

    from geotrellis_server_ray.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_list_names_every_registry_query():
    from geotrellis_server_ray.pipelines.registry import QUERIES

    rc, out = _run(["--list"])
    assert rc == 0
    assert out.split() == list(QUERIES)


def test_unknown_query_rejected_before_ray_startup(capsys):
    rc, _ = _run(["--query", "nope"])
    assert rc == 2


def test_out_writes_pyarrow_table_result(ray_session, sf_correct, tmp_path):
    """color_breaks returns a pyarrow.Table; --out must write it as parquet
    (crashed with Table.from_pandas before the round-3 fix)."""
    out_dir = str(tmp_path / "breaks")
    rc, out = _run(["--query", "color_breaks", "--sf", sf_correct, "--out", out_dir])
    assert rc == 0
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["rows"] > 0
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    assert pq.read_table(out_dir).num_rows == rep["rows"]


def test_out_refuses_nonempty_dir(ray_session, sf_correct, tmp_path):
    d = tmp_path / "occupied"
    d.mkdir()
    (d / "stale.parquet").write_bytes(b"x")
    rc, _ = _run(["--query", "color_breaks", "--sf", sf_correct, "--out", str(d)])
    assert rc == 2

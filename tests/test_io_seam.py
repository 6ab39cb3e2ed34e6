"""Format seam (sources/io.py): parquet fallback today, Lance dispatch when
the lib exists."""

import pytest

from geotrellis_server_ray.sources.io import is_lance_path, read_corpus_table, read_table


def test_parquet_fallback_reads_rows(ray_session, sf_correct):
    ds = read_table(f"{sf_correct}/region.parquet", columns=["r_regionkey"])
    assert ds.count() == 5
    assert ds.schema().names == ["r_regionkey"]  # pruning pushed down


def test_named_table_prefers_parquet_when_no_lance_dir(ray_session, sf_correct):
    ds = read_corpus_table(sf_correct, "nation", columns=["n_nationkey"])
    assert ds.count() == 25


def test_lance_path_detection():
    assert is_lance_path("/data/corpus.lance")
    assert is_lance_path("/data/corpus.lance/")
    assert not is_lance_path("/data/corpus.parquet")


def test_lance_without_lib_raises_clearly(tmp_path):
    try:
        import lance  # noqa: F401

        pytest.skip("lance installed in this environment")
    except ImportError:
        pass
    d = tmp_path / "corpus.lance"
    d.mkdir()
    with pytest.raises(RuntimeError, match="lance"):
        read_table(str(d))

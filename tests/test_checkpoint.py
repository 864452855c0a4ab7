"""Kill/restart resumability (north rule: resumable from checkpoint with
per-partition lineage): a run interrupted after committing a subset of
partitions is resumed by anti-filtering the manifest, and the final output
is byte-identical to golden — the BASELINE.md kill/restart criterion."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from horizon_ocr_python_ray import build_extract_pipeline, read_pages
from horizon_ocr_python_ray.state.checkpoint import (
    filter_to_partition,
    partition_of,
    read_all_output,
    read_manifest,
    run_partitioned,
)

NUM_PARTS = 4


def _fragment_pipeline(corpus_dir, pid):
    pages = read_pages(corpus_dir).map_batches(
        lambda t: filter_to_partition(t, pid, NUM_PARTS), batch_format="pyarrow"
    )
    # Per-fragment dedup only sees its fragment's rows; duplicates that
    # span fragments are each extracted (deterministic → identical bytes).
    return build_extract_pipeline(pages, dedup=False)


def test_kill_restart_resume(tmp_path, corpus_dir, golden_map):
    out_dir = str(tmp_path / "ckpt_out")

    # -- first run "dies" after committing 2 of 4 partitions -------------
    first = run_partitioned(
        lambda pid: _fragment_pipeline(corpus_dir, pid),
        out_dir, NUM_PARTS, max_partitions=2,
    )
    assert first == [0, 1]
    manifest = read_manifest(out_dir)
    assert set(manifest) == {0, 1}
    assert all(rec["rows"] > 0 for rec in manifest.values())

    # -- resume: only the unfinished partitions run ----------------------
    second = run_partitioned(
        lambda pid: _fragment_pipeline(corpus_dir, pid), out_dir, NUM_PARTS
    )
    assert second == [2, 3]

    # -- third run is a no-op (idempotent) -------------------------------
    assert run_partitioned(
        lambda pid: pytest.fail(f"partition {pid} re-ran after commit"),
        out_dir, NUM_PARTS,
    ) == []

    # -- final output: every url exactly once, byte-identical to golden --
    table = read_all_output(out_dir)
    urls = table.column("url").to_pylist()
    assert sorted(urls) == sorted(golden_map)
    texts = table.column("extracted_text").to_pylist()
    for url, text in zip(urls, texts):
        assert text == golden_map[url]["extracted_text"], url

    # Dataset fragments are written by Ray's distributed write_parquet
    # (worker-side multi-file output), not a driver-side single file
    part0_files = [f for f in os.listdir(os.path.join(out_dir, "part=0"))
                   if f.endswith(".parquet")]
    assert part0_files and "data.parquet" not in part0_files

    # lineage records carry rows + checksum per partition
    manifest = read_manifest(out_dir)
    assert set(manifest) == set(range(NUM_PARTS))
    assert sum(rec["rows"] for rec in manifest.values()) == len(golden_map)
    assert all(len(rec["checksum"]) == 32 for rec in manifest.values())


def test_partition_rows_match_key_hash(corpus_dir):
    """Fragment filters are a true partition of the url space."""
    pages = read_pages(corpus_dir).select_columns(["url"])
    all_urls = [r["url"] for r in pages.take_all()]
    seen = []
    for pid in range(NUM_PARTS):
        part = pages.map_batches(
            lambda t, pid=pid: filter_to_partition(t, pid, NUM_PARTS),
            batch_format="pyarrow",
        )
        urls = [r["url"] for r in part.take_all()]
        assert all(partition_of(u, NUM_PARTS) == pid for u in urls)
        seen.extend(urls)
    assert sorted(seen) == sorted(all_urls)


def test_stale_tmp_dir_is_cleaned(tmp_path, corpus_dir, golden_map):
    """A crash mid-write leaves part=N.tmp; the rerun must replace it."""
    out_dir = str(tmp_path / "ckpt_stale")
    os.makedirs(os.path.join(out_dir, "part=0.tmp"))
    with open(os.path.join(out_dir, "part=0.tmp", "data.parquet"), "w") as f:
        f.write("garbage from a dead writer")
    run_partitioned(
        lambda pid: _fragment_pipeline(corpus_dir, pid), out_dir, NUM_PARTS
    )
    assert not os.path.exists(os.path.join(out_dir, "part=0.tmp"))
    table = read_all_output(out_dir)
    assert table.num_rows == len(golden_map)
    texts = dict(zip(table.column("url").to_pylist(),
                     table.column("extracted_text").to_pylist()))
    sample = next(iter(golden_map))
    assert texts[sample] == golden_map[sample]["extracted_text"]


def test_cli_run_and_resume(tmp_path, corpus_dir, golden_map):
    """python -m horizon_ocr_python_ray run — end-to-end + resume summary."""
    import contextlib
    import io
    import json
    import os

    from horizon_ocr_python_ray.__main__ import main

    out_dir = str(tmp_path / "cli_out")
    pages_dir = os.path.join(corpus_dir, "pages")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["run", "--input", pages_dir, "--output", out_dir,
                   "--partitions", "3"])
    assert rc == 0
    s1 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert s1["committed_now"] == 3
    assert s1["total_rows"] == len(golden_map)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["run", "--input", pages_dir, "--output", out_dir,
                   "--partitions", "3"])
    s2 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rc == 0
    assert s2["committed_now"] == 0 and s2["resumed_from"] == 3



def test_bench_outlier_guard(tmp_path):
    """diff_previous_archive flags rows >1.4x slower than the last
    archive and tolerates missing/old-format files."""
    import importlib.util, json, pathlib
    spec = importlib.util.spec_from_file_location(
        "bench_mod", pathlib.Path(__file__).parents[1] / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    arch = tmp_path / "bench_results.json"
    assert bench.diff_previous_archive(str(arch), []) == []
    arch.write_text(json.dumps({"results": [
        {"name": "a", "ms_per_step": 0.4},
        {"name": "b", "ms_per_step": 1.0}]}))
    notes = bench.diff_previous_archive(str(arch), [
        {"name": "a", "ms_per_step": 1.5},    # 3.75x — flag
        {"name": "b", "ms_per_step": 1.1},    # 1.1x — fine
        {"name": "c", "ms_per_step": 9.9}])   # new row — fine
    assert len(notes) == 1 and notes[0].startswith("a: 0.400")

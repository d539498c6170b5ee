

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

    # implausible SPEEDUPS are artifacts too (r5: a burst
    # differential glitch reported 40x on one flowgraph row)
    notes = bench.diff_previous_archive(str(arch), [
        {"name": "a", "ms_per_step": 0.3},    # 1.3x faster — fine
        {"name": "b", "ms_per_step": 0.02}])  # 50x faster — flag
    assert len(notes) == 1 and "implausible speedup" in notes[0]


def test_bench_outlier_guard_rows_without_ms(tmp_path):
    """Rows with no ms_per_step key (the timeblock-scaling proxy row)
    must be skipped, not KeyError — a crash here after the benches have
    run loses the whole TPU record (round-4 regression)."""
    import importlib.util, json, pathlib
    spec = importlib.util.spec_from_file_location(
        "bench_mod2", pathlib.Path(__file__).parents[1] / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    arch = tmp_path / "bench_results.json"
    # previous archive itself contains the keyless proxy row
    arch.write_text(json.dumps({"results": [
        {"name": "a", "ms_per_step": 0.4},
        {"name": "timeblock-scaling[cpu-proxy]", "msamp_s": 7.5,
         "efficiency": 0.07, "n_devices": 8,
         "samples_per_step": 2097152}]}))
    notes = bench.diff_previous_archive(str(arch), [
        {"name": "a", "ms_per_step": 1.5},
        {"name": "timeblock-scaling[cpu-proxy]", "msamp_s": 8.0,
         "efficiency": 0.08, "n_devices": 8,
         "samples_per_step": 2097152},
        # current row missing the key while old HAS it — also no crash
        {"name": "b"}])
    assert len(notes) == 1 and notes[0].startswith("a: 0.400")

"""Regenerate the measured-performance blocks in README.md and CLAUDE.md
from a bench JSON (VERDICT r2 weak #8: perf text must be generated from
the driver-captured numbers, not hand-edited).

Usage:
    python tools/perf_docs.py [BENCH_rNN.json | bench_out.json]

With no argument, picks the newest BENCH_r*.json in the repo root.
Accepts either the driver wrapper format ({"parsed": {...}}) or the raw
one-line JSON that bench.py prints.  Rewrites the text between
``<!-- BENCH:BEGIN -->`` / ``<!-- BENCH:END -->`` markers in README.md
and CLAUDE.md; everything outside the markers is untouched.

Deliberately imports nothing heavy (no jax) so it can run any time.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = '<!-- BENCH:BEGIN -->', '<!-- BENCH:END -->'


def load_bench(path):
    with open(path) as f:
        data = json.load(f)
    # Driver wrapper: {"parsed": {...}} — but 'parsed' can exist with
    # JSON null when the capture was tail-truncated (BENCH_r04.json);
    # fall back to the raw dict only when the key is genuinely absent,
    # and fail loudly on a null capture rather than rendering from the
    # wrapper metadata.
    if 'parsed' in data:
        parsed = data['parsed']
        if parsed is None:
            raise SystemExit(
                f'{path}: driver capture has "parsed": null (tail-'
                'truncated run) — regenerate from a complete bench '
                'output (e.g. the BENCH_FULL.json bench.py writes).')
        return parsed
    return data


def fmt(x, nd=1):
    """Fixed-point with trailing-zero cleanup AFTER the decimal point
    only ('60.0' -> '60', but never '60' -> '6')."""
    if not isinstance(x, float):
        return str(x)
    s = f'{x:.{nd}f}'
    return s.rstrip('0').rstrip('.') if '.' in s else s


def render_readme(m, src_name='bench'):
    """Markdown table for README.md from bench-metric dict ``m``."""
    g = m.get
    rows = []

    def row(label, text):
        rows.append(f'| {label} | {text} |')

    if g('tpu_batch32_pairs_per_sec'):
        t = f"**{fmt(g('tpu_batch32_pairs_per_sec'), 0)}**"
        if g('cpu_kdtree_pairs_per_sec'):
            t += (f" (**{fmt(g('tpu_batch32_pairs_per_sec') / g('cpu_kdtree_pairs_per_sec'), 0)}x** CPU"
                  f" at {fmt(g('cpu_kdtree_pairs_per_sec'), 1)} pairs/s)")
        row('ICP scan-pairs/s, batched x32 (projective, coarse-to-fine)', t)
    if g('tpu_projective_pairs_per_sec'):
        t = fmt(g('tpu_projective_pairs_per_sec'), 0)
        if g('cpu_kdtree_pairs_per_sec'):
            t += (f" ({fmt(g('tpu_projective_pairs_per_sec') / g('cpu_kdtree_pairs_per_sec'), 0)}x CPU"
                  ' single-pair latency)')
        row('ICP scan-pairs/s, single stream (projective)', t)
    if g('tpu_pallas_pairs_per_sec'):
        row('Exact-NN matchers (kd-tree parity)',
            f"{fmt(g('tpu_pallas_pairs_per_sec'), 0)} pairs/s Pallas VPU kernel"
            f" / {fmt(g('tpu_brute_pairs_per_sec'), 0)} brute")
    if g('tpu_e2e_beam16k_scans_per_sec'):
        t = f"{fmt(g('tpu_e2e_beam16k_scans_per_sec'), 0)} scans/s per-scan dispatch"
        if g('tpu_e2e_beam16k_chunked_scans_per_sec'):
            t = (f"**{fmt(g('tpu_e2e_beam16k_chunked_scans_per_sec'), 0)}** scans/s chunked / "
                 + t)
        if g('vs_cpu_e2e_16k'):
            t += f" ({fmt(max(g('vs_cpu_e2e_16k'), g('vs_cpu_e2e_16k_chunked') or 0), 0)}x CPU e2e)"
        row('End-to-end online SLAM, 16k-pt 64-beam scans', t)
    if g('tpu_e2e_kitti_density_scans_per_sec'):
        t = f"{fmt(g('tpu_e2e_kitti_density_scans_per_sec'), 0)} scans/s per-scan dispatch"
        kmin = (g('tpu_e2e_kitti_density_scans_per_sec_min')
                or g('tpu_e2e_kitti_scans_per_sec_min'))
        kmax = (g('tpu_e2e_kitti_density_scans_per_sec_max')
                or g('tpu_e2e_kitti_scans_per_sec_max'))
        if kmin:
            t += (f" (median of 5 runs, {fmt(kmin, 0)}"
                  f"-{fmt(kmax, 0)} spread)")
        if g('tpu_e2e_kitti_chunked_scans_per_sec'):
            t = (f"**{fmt(g('tpu_e2e_kitti_chunked_scans_per_sec'), 0)}** scans/s chunked / "
                 + t)
        if g('vs_cpu_e2e_kitti'):
            t += f" ({fmt(max(g('vs_cpu_e2e_kitti'), g('vs_cpu_e2e_kitti_chunked') or 0), 0)}x CPU e2e)"
        row('End-to-end at KITTI density (131k-pt, 64-beam)', t)
    if g('tpu_e2e_kitti_packed_scans_per_sec'):
        t = f"{fmt(g('tpu_e2e_kitti_packed_scans_per_sec'), 0)} scans/s per-scan"
        if g('tpu_e2e_kitti_packed_chunked_scans_per_sec'):
            t = (f"**{fmt(g('tpu_e2e_kitti_packed_chunked_scans_per_sec'), 0)}** scans/s chunked / "
                 + t)
        vs_p = max(g('vs_cpu_e2e_kitti_packed') or 0,
                   g('vs_cpu_e2e_kitti_packed_chunked') or 0)
        if vs_p:
            t += f" ({fmt(vs_p, 0)}x CPU e2e)"
        row('KITTI density, packed uint16 ingest (sensor-native 2 B/pt)', t)
    if g('tpu_e2e_kitti_device_ms_per_scan'):
        t = (f"**{fmt(g('tpu_e2e_kitti_device_ms_per_scan'), 1)} ms/scan**"
             f" KITTI ({fmt(g('tpu_e2e_kitti_device_scans_per_sec'), 0)} scans/s"
             ' device-bound)')
        if g('tpu_e2e_beam16k_device_ms_per_scan'):
            t += (f" / {fmt(g('tpu_e2e_beam16k_device_ms_per_scan'), 1)} ms at 16k"
                  f" ({fmt(g('tpu_e2e_beam16k_device_scans_per_sec'), 0)} scans/s)")
        row('E2e device time per scan (chained-marginal, transport-free)', t)
    if g('tpu_e2e_multirobot_scans_per_sec'):
        t = f"{fmt(g('tpu_e2e_multirobot_scans_per_sec'), 0)} scans/s interleaved"
        if g('tpu_e2e_multirobot_chunked_scans_per_sec'):
            t = (f"**{fmt(g('tpu_e2e_multirobot_chunked_scans_per_sec'), 0)}**"
                 ' scans/s chunked / ' + t)
        if g('tpu_multirobot_link_closure_ms'):
            t += (f"; linking closure {fmt(g('tpu_multirobot_link_closure_ms'), 0)} ms,"
                  f" linked ATE {fmt((g('tpu_multirobot_linked_ate_m') or 0) * 100, 0)} cm")
        row('Multi-robot e2e: 2 tracks, one shared graph (16k scans)', t)
    if g('tpu_e2e_kitti_pr_scans_per_sec'):
        t = f"**{fmt(g('tpu_e2e_kitti_pr_scans_per_sec'), 0)}** scans/s at KITTI density"
        if g('tpu_e2e_beam16k_pr_scans_per_sec'):
            t += f" / {fmt(g('tpu_e2e_beam16k_pr_scans_per_sec'), 0)} at 16k"
        if g('vs_cpu_e2e_kitti_pr'):
            t += f" ({fmt(g('vs_cpu_e2e_kitti_pr'), 0)}x CPU e2e)"
        if g('tpu_e2e_kitti_pr_detections') is not None:
            t += (f"; {g('tpu_e2e_kitti_pr_detections')} closures"
                  ' auto-detected, ICP-verified and solved in the timed window')
        row('Flagship: SLAM + on-device loop-closure detection (chunked)', t)
    if g('tpu_solve_ms_per_scan_window64') is not None:
        t = f"{fmt(g('tpu_solve_ms_per_scan_window64'), 2)} ms marginal device cost"
        if g('tpu_solve_window64_amortized_ms'):
            t += f" / {fmt(g('tpu_solve_window64_amortized_ms'), 1)} ms amortized"
        if g('cpu_sparse_backsolve_10k_ms'):
            t += (f" (CPU anchors: {fmt(g('cpu_sparse_factorize_solve_10k_ms'), 0)} ms refactorize"
                  f" / {fmt(g('cpu_sparse_backsolve_10k_ms'), 1)} ms cached backsolve)")
        row('Per-scan incremental solve (window=64 slice of 10k-pose graph)', t)
    if g('tpu_gn_solve_10k_cold_ms'):
        t = (f"{fmt(g('tpu_gn_solve_10k_cold_ms'), 0)} ms cold /"
             f" {fmt(g('tpu_gn_solve_10k_incremental_ms'), 0)} ms incremental wall")
        if g('tpu_gn_solve_10k_incremental_device_ms') is not None:
            t += (f" / **{fmt(g('tpu_gn_solve_10k_incremental_device_ms'), 1)} ms**"
                  ' incremental device (dispatch-floor-free)')
        if g('tpu_gn_solve_10k_delta_device_ms') is not None:
            t += (f"; relinearize-skip delta closure solve"
                  f" {fmt(g('tpu_gn_solve_10k_delta_device_ms'), 1)} ms device")
            if g('tpu_gn_solve_delta_vs_full_m') is not None:
                t += (f" ({fmt(g('tpu_gn_solve_delta_vs_full_m') * 1000, 1)} mm"
                      ' from the full solve)')
        if g('tpu_closure_burst_amortized_ms') is not None:
            t += (f"; closure burst {fmt(g('tpu_closure_burst_amortized_ms'), 1)}"
                  f" ms/closure amortized over {g('tpu_closure_burst_k') or 8}"
                  ' incl. one cache build')
        row('10k-pose graph solve, perturbed init (PCG, converged)', t)
    if g('tpu_marginal_cov_10k_8keys_ms'):
        t = (f"{fmt(g('tpu_marginal_cov_10k_ms_per_key'), 1)} ms/key f32 device probes"
             ' (well-observed modes; envelope in solver.marginal_covariance)')
        if g('tpu_marginal_cov_cached_ms_per_key') is not None:
            t += (f" / {fmt(g('tpu_marginal_cov_cached_ms_per_key'), 1)} ms/key"
                  ' cache-only')
        if g('exact_marginal_host_ms_per_key') is not None:
            t += (f"; EXACT f64 host path (gtsam-Marginals class)"
                  f" {fmt(g('exact_marginal_host_ms_per_key'), 0)} ms/key")
        row('Marginal covariance queries (10k-pose graph)', t)
    if g('tpu_fleet256_pairs_per_sec'):
        row('Fleet mode: 256 parallel scan-to-scan registrations (4k pts)',
            f"{fmt(g('tpu_fleet256_pairs_per_sec'), 0)} pairs/s")
    if g('tpu_fleet256_map_queries_per_sec'):
        row('Fleet mode: 256-lane local-map NN queries (16k-pt maps)',
            f"{fmt(g('tpu_fleet256_map_queries_per_sec') / 1e6, 1)} M queries/s")
    if g('tpu_scan_context_queries_per_sec'):
        t = (f"{fmt(g('tpu_scan_context_queries_per_sec'), 0)} queries/s"
             ' dispatched (descriptor build + all entries x all rotations)')
        if g('tpu_scan_context_device_queries_per_sec'):
            t = (f"**{fmt(g('tpu_scan_context_device_queries_per_sec'), 0)}**"
                 ' queries/s on device / ' + t)
        row('Place recognition: scan-context query vs 4096-scan database', t)

    lines = [
        f"Measured on `{g('device', 'TPU v5e')}` (source: `{src_name}`, the",
        'driver-captured run; regenerate with `python tools/perf_docs.py`):',
        '',
        '| Metric | Value |',
        '|---|---|',
        *rows,
    ]
    if g('tpu_e2e_beam16k_mean_err_m') is not None:
        lines += [
            '',
            f"Trajectory quality on the same runs: {fmt(g('tpu_e2e_beam16k_mean_err_m') * 100, 1)} cm"
            f" mean error vs ground truth at 16k"
            + (f", {fmt(g('tpu_e2e_kitti_mean_err_m') * 100, 1)} cm at KITTI density."
               if g('tpu_e2e_kitti_mean_err_m') is not None else '.'),
        ]
    if g('cpu_e2e_scans_per_sec'):
        lines += [
            f"CPU end-to-end baseline (float64 oracle pipeline, same frames):"
            f" {fmt(g('cpu_e2e_scans_per_sec'), 2)} scans/s at 16k /"
            f" {fmt(g('cpu_e2e_kitti_density_scans_per_sec'), 2)} at KITTI density.",
        ]
    bd = g('tpu_step_breakdown_ms')
    if isinstance(bd, dict) and bd:
        parts = ', '.join(f'{k} {fmt(float(v), 2)}' for k, v in bd.items())
        lines += [
            '',
            'Per-scan device-time breakdown at KITTI density (chained-marginal',
            f'ms — dispatch-floor-free, see `pipeline/profiling.py`): {parts}.',
        ]
    if g('tpu_nn_brute_mfu_vs_bf16_peak') is not None:
        roof = (f"Roofline: brute-NN distance matmul"
                f" {fmt(g('tpu_nn_brute_achieved_tflops'), 1)} TFLOP/s")
        if g('tpu_nn_brute_fraction_of_shape_ceiling') is not None:
            roof += (f" ({fmt(g('tpu_nn_brute_fraction_of_shape_ceiling') * 100, 0)}%"
                     ' of the [Q,3]x[3,R] shape+precision MXU ceiling)')
        else:
            roof += (f" ({fmt(g('tpu_nn_brute_mfu_vs_bf16_peak') * 100, 0)}% of the"
                     ' 197 TF/s bf16 peak)')
        if g('tpu_pallas_nn_achieved_hbm_gbps') is not None:
            roof += (f"; pallas exact-NN kernel"
                     f" {fmt(g('tpu_pallas_nn_achieved_hbm_gbps'), 0)} GB/s HBM"
                     f" ({fmt((g('tpu_pallas_nn_hbm_fraction') or 0) * 100, 0)}%"
                     ' of peak)')
        lines += ['', roof + '.']
    lines += [
        '',
        'Batched throughput and single-pair latency are different claims: the',
        'batch-32 ratio is fleet/serving throughput vs one CPU core; the',
        'single-stream ratio is the robot-on-a-chip latency story.  Both are',
        'listed above.',
    ]
    return '\n'.join(lines)


def render_claude(m, src_name='bench'):
    """Compact working-notes block for CLAUDE.md."""
    g = m.get
    lines = [f'(generated by tools/perf_docs.py from {src_name} — do not hand-edit numbers)', '']
    if g('tpu_batch32_pairs_per_sec'):
        r = (f" ({fmt(g('tpu_batch32_pairs_per_sec') / g('cpu_kdtree_pairs_per_sec'), 0)}x CPU"
             f" {fmt(g('cpu_kdtree_pairs_per_sec'), 1)})" if g('cpu_kdtree_pairs_per_sec') else '')
        lines.append(f"- ICP pairs/s: {fmt(g('tpu_batch32_pairs_per_sec'), 0)} batched x32"
                     f" / {fmt(g('tpu_projective_pairs_per_sec'), 0)} single (projective){r};"
                     f" exact-NN {fmt(g('tpu_pallas_pairs_per_sec'), 0)} pallas"
                     f" / {fmt(g('tpu_brute_pairs_per_sec'), 0)} brute.")
    if g('tpu_e2e_beam16k_scans_per_sec'):
        ck16 = (f" ({fmt(g('tpu_e2e_beam16k_chunked_scans_per_sec'), 0)} chunked)"
                if g('tpu_e2e_beam16k_chunked_scans_per_sec') else '')
        ckk = (f" ({fmt(g('tpu_e2e_kitti_chunked_scans_per_sec'), 0)} chunked)"
               if g('tpu_e2e_kitti_chunked_scans_per_sec') else '')
        lines.append(f"- E2e beam-scan SLAM: {fmt(g('tpu_e2e_beam16k_scans_per_sec'), 0)} scans/s"
                     f"{ck16} at 16k; {fmt(g('tpu_e2e_kitti_density_scans_per_sec'), 0)} scans/s"
                     f"{ckk} at KITTI 131k.  CPU e2e baseline"
                     f" {fmt(g('cpu_e2e_scans_per_sec') or 0, 2)} / "
                     f"{fmt(g('cpu_e2e_kitti_density_scans_per_sec') or 0, 2)} scans/s.")
        if g('tpu_e2e_kitti_packed_scans_per_sec'):
            lines.append(f"- Packed uint16 ingest (2 B/pt, on-device decode):"
                         f" {fmt(g('tpu_e2e_kitti_packed_scans_per_sec'), 0)} scans/s"
                         f" ({fmt(g('tpu_e2e_kitti_packed_chunked_scans_per_sec') or 0, 0)} chunked)"
                         f" at KITTI 131k; {fmt(g('tpu_e2e_beam16k_packed_scans_per_sec') or 0, 0)}"
                         ' at 16k.')
    if g('tpu_e2e_kitti_pr_scans_per_sec'):
        lines.append(f"- Flagship SLAM+detection e2e (chunked, woodbury):"
                     f" {fmt(g('tpu_e2e_kitti_pr_scans_per_sec'), 0)} scans/s"
                     f" KITTI / {fmt(g('tpu_e2e_beam16k_pr_scans_per_sec') or 0, 0)}"
                     f" at 16k; {g('tpu_e2e_kitti_pr_detections')} verified"
                     ' closures in-window.')
    if g('tpu_e2e_kitti_device_ms_per_scan'):
        lines.append(f"- Device-bound e2e (transport-free):"
                     f" {fmt(g('tpu_e2e_kitti_device_ms_per_scan'), 1)} ms/scan"
                     f" KITTI / {fmt(g('tpu_e2e_beam16k_device_ms_per_scan') or 0, 1)} ms at 16k.")
    if g('tpu_e2e_multirobot_scans_per_sec'):
        lines.append(f"- Multi-robot (2 tracks, shared graph):"
                     f" {fmt(g('tpu_e2e_multirobot_scans_per_sec'), 0)} scans/s"
                     f" ({fmt(g('tpu_e2e_multirobot_chunked_scans_per_sec') or 0, 0)} chunked);"
                     f" linked ATE {fmt((g('tpu_multirobot_linked_ate_m') or 0) * 100, 0)} cm.")
    if g('tpu_gn_solve_10k_cold_ms'):
        dev = (f" ({fmt(g('tpu_gn_solve_10k_incremental_device_ms'), 1)} ms device)"
               if g('tpu_gn_solve_10k_incremental_device_ms') is not None
               else '')
        lines.append(f"- Solver: 10k-pose GN {fmt(g('tpu_gn_solve_10k_cold_ms'), 0)} ms cold"
                     f" / {fmt(g('tpu_gn_solve_10k_incremental_ms'), 0)} ms incremental{dev};"
                     f" window-64 per-scan marginal {fmt(g('tpu_solve_ms_per_scan_window64'), 2)} ms"
                     f" (CPU sparse: {fmt(g('cpu_sparse_factorize_solve_10k_ms') or 0, 0)} ms factorize"
                     f" / {fmt(g('cpu_sparse_backsolve_10k_ms') or 0, 1)} ms backsolve).")
    if g('tpu_fleet256_pairs_per_sec'):
        mq = (f"; map queries {fmt(g('tpu_fleet256_map_queries_per_sec') / 1e6, 1)}M/s"
              if g('tpu_fleet256_map_queries_per_sec') else '')
        lines.append(f"- Fleet-256 vmap: {fmt(g('tpu_fleet256_pairs_per_sec'), 0)} pairs/s{mq}.")
    if g('tpu_scan_context_queries_per_sec'):
        lines.append(f"- Scan-context PR query: {fmt(g('tpu_scan_context_queries_per_sec'), 0)}/s"
                     ' vs 4096-scan db.')
    lines.append('- Capacity growth recompiles online_step (~10 s over the tunnel):'
                 ' pre-size capacities for the run length; growth is the safety'
                 ' net.  B=64 batched ICP hits an XLA scheduling pathology'
                 ' (bucketing skips it automatically).')
    return '\n'.join(lines)


def splice(path, text):
    with open(path) as f:
        src = f.read()
    if BEGIN not in src or END not in src:
        raise SystemExit(f'{path}: missing {BEGIN}/{END} markers')
    new = re.sub(re.escape(BEGIN) + r'.*?' + re.escape(END),
                 BEGIN + '\n' + text + '\n' + END, src, flags=re.S)
    with open(path, 'w') as f:
        f.write(new)
    print(f'updated {os.path.relpath(path, ROOT)}')


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        cands = sorted(glob.glob(os.path.join(ROOT, 'BENCH_r*.json')))
        if not cands:
            raise SystemExit('no BENCH_r*.json found')
        path = cands[-1]
    print(f'source: {os.path.relpath(path, ROOT)}')
    m = load_bench(path)
    src_name = os.path.basename(path)
    splice(os.path.join(ROOT, 'README.md'), render_readme(m, src_name))
    splice(os.path.join(ROOT, 'CLAUDE.md'), render_claude(m, src_name))


if __name__ == '__main__':
    main()

"""Run all TPU measurements in ONE long-lived process.

The axon remote compile service intermittently takes minutes per
executable; a single process reuses every jit cache entry across
phases (and primes the persistent compilation cache for later runs).

    python scripts/tpu_session.py [phase ...]
    phases: measure ladder seg1e5 train_mha eval bench   (default: all)
"""

import os
import runpy
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def run(script, argv, tag):
    print(f"\n======== {tag}: {script} {' '.join(argv)}", flush=True)
    t0 = time.time()
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(ROOT, script), run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"{tag}: exited {e.code}", flush=True)
    except Exception as e:
        print(f"{tag} FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
    finally:
        sys.argv = old
    print(f"======== {tag} done in {time.time()-t0:.0f}s", flush=True)


def main():
    argv_phases = sys.argv[1:] or ["measure", "ladder", "seg1e5",
                                   "bench"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices={jax.devices()}", flush=True)

    # phases execute in CLI order (each runs once)
    for phase in argv_phases:
        phases = [phase]
        _run_phase(phases)


def _run_phase(phases):
    if "measure" in phases:
        run("scripts/measure_l2f.py", ["--ks", "0,5000"], "measure_l2f")
    if "ladder" in phases:
        run("scripts/bench_ladder.py",
            ["--rungs", "200x1000,300x1500,800x4000"], "ladder")
    if "ablate" in phases:
        run("scripts/ablate_lp.py", ["--repeats", "2"], "ablate")
    if "seg1e5" in phases:
        run("experiments/run_seg.py",
            ["-phase", "test", "-num_nodes", "100000",
             "-image_list",
             "2,3,11,14,16,17,21,24,25,33,34,39,45,46,56,57,59,63,64,"
             "76,82,83,86,88",
             "-checkpoint",
             "checkpoints/seg_mha/checkpoint/best_checkpoint.npz",
             "-result_dir", "result_seg1e5"], "seg1e5")
    if "train_mha" in phases:
        run("scripts/train_ca500_policy.py",
            ["-net", "mha", "-n_train", "96", "-n_eval", "16",
             "-epochs", "60", "-eval_every", "5", "-out",
             "checkpoints_r2"], "train_mha")
    if "eval" in phases:
        run("scripts/eval_policy.py", ["-net", "mlp"], "eval_mlp")
        run("scripts/eval_policy.py", ["-net", "mha"], "eval_mha")
    if "bench" in phases:
        run("bench.py", [], "bench")
    # ---- round-3 phases ---------------------------------------------
    if "probe_stream" in phases:
        # stream-vs-two-pass fixed-iteration probe at the big rungs
        for rung in ("300x1500", "800x4000"):
            run("scripts/probe_iter_cost.py",
                ["--rung", rung, "--iters", "500", "--path", "xla"],
                f"probe_xla_{rung}")
            run("scripts/probe_iter_cost.py",
                ["--rung", rung, "--iters", "500", "--path", "stream"],
                f"probe_stream_{rung}")
    if "ladder_stream" in phases:
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers", "stream-bf16-c10000"],
            "ladder_stream")
    if "sparse_rung" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--probe"],
            "sparse_probe")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8"], "sparse_rung")
        # mega rung (1e5 bids, COO end-to-end; m with dummies ~2e4 ->
        # CG): fixed-iteration probe only, convergence needs ~1e4 iters
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "2", "--probe",
             "--linsolve", "cg"], "sparse_mega_probe")
    if "attack_victim" in phases:
        run("experiments/run_attack.py",
            ["-phase", "solve", "-n", "32",
             "-victim", "checkpoints/cifar_victim.npz",
             "-result_dir", "result"], "attack_plain_victim")
        run("experiments/run_attack.py",
            ["-phase", "test", "-net", "mha", "-n", "32",
             "-victim", "checkpoints/cifar_victim.npz",
             "-checkpoint",
             "checkpoints/attack_mha/checkpoint/best_checkpoint.npz",
             "-result_dir", "result"], "attack_l2f_victim")
    if "seg1e5_r3" in phases:
        # compacted + refinement A/B at the 1e5-px generalization eval
        common = ["-phase", "test", "-num_nodes", "100000",
                  "-image_list",
                  "2,3,11,14,16,17,21,24,25,33,34,39,45,46,56,57,59,"
                  "63,64,76,82,83,86,88",
                  "-checkpoint",
                  "checkpoints/seg_mha/checkpoint/best_checkpoint.npz"]
        run("experiments/run_seg.py",
            common + ["-compact", "0", "-result_dir", "result_seg1e5"],
            "seg1e5_masked")
        run("experiments/run_seg.py",
            common + ["-compact", "1", "-result_dir", "result_seg1e5"],
            "seg1e5_compact")
        run("experiments/run_seg.py",
            common + ["-compact", "1", "-refine_iters", "10",
                      "-result_dir", "result_seg1e5"],
            "seg1e5_refine")
    if "probe_stream_only" in phases:
        # re-run after the rank-4 layout fix (xla baselines already
        # measured: 135.2k inst-iters/s at 300x1500, 17.0k at 800x4000)
        for rung in ("300x1500", "800x4000"):
            run("scripts/probe_iter_cost.py",
                ["--rung", rung, "--iters", "500", "--path", "stream"],
                f"probe_stream_{rung}")
    if "sparse_probe_only" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--probe"],
            "sparse_probe")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "2", "--probe",
             "--linsolve", "cg"], "sparse_mega_probe")
    if "sparse_ops" in phases:
        # component-level gather-vs-dense timings (safe: woodbury only;
        # the CG mega probe crashed the worker on 2026-08-18 and stays
        # quarantined behind cg_bisect)
        run("scripts/probe_sparse_ops.py",
            ["--rung", "1000x10000", "--batch", "8"], "sparse_ops")
    if "dense_rung_10k" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--dense"],
            "dense_rung_10k")
    if "dense_mega" in phases:
        # (1000, 1e5): bf16 E ~4 GB -> batch 1 (factorize peak holds
        # E + chol + eye + ginv); host LAPACK ginv (the remote
        # compiler failed on the m~2e4 cholesky program); oracle runs
        # separately on CPU
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--dense",
             "--host-ginv", "--no-oracle"], "dense_mega")
    if "dense_mega_ab" in phases:
        # cap-12000 bf16 run was sick (obj -68.5k vs oracle -98.8k,
        # 97 infeasible; host f32 ginv residual 3e-6 rules out the
        # factorization): A/B the storage dtype at cap 20000
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--dense",
             "--host-ginv", "--no-oracle", "--cap", "20000",
             "--e-dtype", "f32"], "dense_mega_f32")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--dense",
             "--host-ginv", "--no-oracle", "--cap", "20000"],
            "dense_mega_bf16_c20k")
    if "symm_check" in phases:
        # MUST pass before any perf run that includes symm_matvec
        # (interpret mode is not evidence: the v1 kernel passed it and
        # was wrong on the chip)
        run("scripts/check_symm_tpu.py", [], "symm_check")
    if "stream_rungs" in phases:
        # stream kernel + triangular G^-1 read at the big rungs
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers", "stream-bf16-c10000"],
            "ladder_stream_symm")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--dense",
             "--stream"], "stream_rung_10k")
    if "xl_caps" in phases:
        # drop-to-feasible reporting unlocks caps below the incumbent's
        # first-feasible point (~9k): quality gate moves to the
        # objective; target >=4.1 inst/s (100x) at (800,4000)
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-c10000,stream-bf16-c8000-rep,"
             "stream-bf16-c6000-rep,stream-bf16-c5000-rep,"
             "stream-bf16-c10000-rep"], "xl_caps")
    if "seg_refine" in phases:
        # widen the post-fix refinement toward the <=3% 1e5-px target
        # (r3: ref10 measured +6.66% -> +4.61%; sweep rounds/band)
        run("scripts/eval_seg_1e5.py",
            ["--variants",
             "masked+ref10,masked+ref10r2b2,masked+ref20r2b2,"
             "masked+ref10r3b3"], "seg_refine")
    if "xl_ginv" in phases:
        # G^-1 is ~45% of the xl per-iteration HBM traffic after the
        # stream kernel: A/B bf16 storage (lossy, halved bytes) and
        # the packed-symmetric exact read (win iff XLA sibling-fuses)
        # against the measured 3.3 inst/s c10000-rep baseline
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-g16-c10000-rep,stream-bf16-sym-c10000-rep"],
            "xl_ginv")
    if "xl_frontier" in phases:
        # quality-throughput frontier between c8000 (+7% gap0) and
        # c10000 (-9%): find the cap where rep quality crosses
        # reference parity (gap0 ~ 0); no new compiles (the cap only
        # changes the host-side round count over cached window execs)
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-c9000-rep,stream-bf16-c9500-rep"],
            "xl_frontier")
    if "xl_c8500" in phases:
        # last frontier point: the quality cliff sits in (8000, 9000)
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-c8500-rep"], "xl_c8500")
    if "seg_ft" in phases:
        # 1e5-px fine-tune of the 1e4-px sliding policy (VERDICT r2
        # item 6): train imgs disjoint from the 24-image test list,
        # best-ckpt selection on a separate held-out validation list
        # (no test leakage); final number = eval_seg_1e5 on the test
        # list with the kept checkpoint
        run("experiments/run_seg.py",
            ["-phase", "train", "-num_nodes", "100000",
             "-train_image_list",
             "0,1,4,5,6,7,8,9,10,12,13,15,18,19,20,22",
             "-image_list", "26,28,30,31,35,36,37,38",
             "-init_checkpoint",
             "checkpoints/seg_mha/checkpoint/best_checkpoint.npz",
             "-lr", "1e-5", "-num_epochs", "6",
             "-save_dir", "checkpoints_r3/seg_mha_ft1e5"], "seg_ft")
        run("scripts/eval_seg_1e5.py",
            ["--variants", "masked+ref10r2b2",
             "--checkpoint",
             "checkpoints_r3/seg_mha_ft1e5/checkpoint/"
             "best_checkpoint.npz"], "seg_ft_eval")
    if "seg_ft2" in phases:
        # fine-tune round 2: best-ckpt selection under the FULL test
        # reporting semantics (refine + both-sides polish) -- the r3c
        # fine-tune's measured failure mode was selection-signal
        # mismatch (validation won raw, test lost polished)
        run("experiments/run_seg.py",
            ["-phase", "train", "-num_nodes", "100000",
             "-train_image_list",
             "0,1,4,5,6,7,8,9,10,12,13,15,18,19,20,22",
             "-image_list", "26,28,30,31,35,36,37,38",
             "-init_checkpoint",
             "checkpoints/seg_mha/checkpoint/best_checkpoint.npz",
             "-lr", "1e-5", "-num_epochs", "6",
             "-eval_semantics", "full",
             "-refine_iters", "10", "-refine_rounds", "2",
             "-refine_band", "2",
             "-save_dir", "checkpoints_r3/seg_mha_ft1e5b"], "seg_ft2")
        run("scripts/eval_seg_1e5.py",
            ["--variants", "masked+ref10r2b2",
             "--checkpoint",
             "checkpoints_r3/seg_mha_ft1e5b/checkpoint/"
             "best_checkpoint.npz"], "seg_ft2_eval")
    if "seg_portfolio" in phases:
        # per-image best-of over the shipped and 1e5-px fine-tuned
        # sliding policies (equal semantics; selection uses only the
        # l2f sides' own energies)
        run("scripts/eval_seg_1e5.py",
            ["--variants", "masked+ref10r2b2",
             "--checkpoint",
             "checkpoints/seg_mha/checkpoint/best_checkpoint.npz,"
             "checkpoints_r3/seg_mha_ft1e5/checkpoint/"
             "best_checkpoint.npz"], "seg_portfolio")
    # ---- round-4 phases ---------------------------------------------
    if "mxu_probe" in phases:
        # gather-vs-MXU component A/B + chunk sweep at the 10k rung
        run("scripts/probe_sparse_ops.py",
            ["--rung", "1000x10000", "--batch", "8"], "mxu_probe_10k")
    if "mxu_probe_mega" in phases:
        run("scripts/probe_sparse_ops.py",
            ["--rung", "1000x100000", "--batch", "1", "--skip-gather"],
            "mxu_probe_mega")
    if "sparse_rung_mxu" in phases:
        # end-to-end ELL solve through the MXU route (r3 gather
        # baseline: 0.004 inst/s; dense-bf16 stream: 0.12 inst/s)
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8"],
            "sparse_rung_mxu_10k")
    if "sparse_mega_mxu" in phases:
        # (1000, 1e5): ELL + host LAPACK ginv, fixed-iteration probe
        # then full solve at the dense run's operating point (f32-E
        # dense measured 561 s = 1.41x CPU wall; cap 20000)
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--probe",
             "--host-ginv"], "sparse_mega_mxu_probe")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--host-ginv",
             "--cap", "20000", "--no-oracle"], "sparse_mega_mxu")
    if "xl_rho" in phases:
        # iteration cut via a faster rho schedule at equal reported
        # quality (caps scaled by 25/rs to hold the rho trajectory
        # endpoint fixed); targets >=4.1 inst/s (100x) at gap0 <= 0
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-rs20-c8000-rep,stream-bf16-rs20-c7200-rep,"
             "stream-bf16-rs18-c6500-rep,stream-bf16-rs22-c8000-rep"],
            "xl_rho")
    if "struct_10k" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--struct"],
            "struct_10k")
    if "struct_mega" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--host-ginv", "--probe"], "struct_mega_probe")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--host-ginv", "--cap", "20000", "--no-oracle"],
            "struct_mega")
    if "struct_mega_b4" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "4", "--struct",
             "--host-ginv", "--cap", "20000", "--no-oracle"],
            "struct_mega_b4")
    if "struct_2000" in phases:
        # stretch: one (2000, 2e5)-class instance end-to-end (VERDICT
        # r3 item 2); oracle would take hours -- run without
        run("scripts/bench_sparse_rung.py",
            ["--rung", "2000x200000", "--batch", "1", "--struct",
             "--host-ginv", "--cap", "20000", "--no-oracle"],
            "struct_2000")
    if "attack64" in phases:
        # VERDICT r3 item 8: the full shipped image set (the repo has
        # 100 PNGs; 64 = every image with a distinct target) vs the
        # TRAINED victim, per-image L-norm quartiles, l2f vs plain
        run("experiments/run_attack.py",
            ["-phase", "solve", "-n", "64",
             "-victim", "checkpoints/cifar_victim.npz",
             "-result_dir", "result_r4"], "attack64_plain")
        run("experiments/run_attack.py",
            ["-phase", "test", "-net", "mha", "-n", "64",
             "-victim", "checkpoints/cifar_victim.npz",
             "-checkpoint",
             "checkpoints/attack_mha/checkpoint/best_checkpoint.npz",
             "-result_dir", "result_r4"], "attack64_l2f")
    if "attack100" in phases:
        # FULL reference image set (100 PNGs; main_mha.py globs all of
        # data/*) with the budget-aware lambda1 search + doubled
        # re-finetune repair (VERDICT r4 item 7)
        run("experiments/run_attack.py",
            ["-phase", "solve", "-n", "100",
             "-victim", "checkpoints/cifar_victim.npz",
             "-result_dir", "result_r5"], "attack100_plain")
        run("experiments/run_attack.py",
            ["-phase", "test", "-net", "mha", "-n", "100",
             "-victim", "checkpoints/cifar_victim.npz",
             "-checkpoint",
             "checkpoints/attack_mha/checkpoint/best_checkpoint.npz",
             "-result_dir", "result_r5"], "attack100_l2f")
    if "struct_direct" in phases:
        # re-measure the struct route with the small-m DIRECT one-hot
        # matvecs (the item block's lane-spread gather was 7 of the
        # mega iteration's 9.4 ms)
        run("scripts/probe_struct_ops.py",
            ["--rung", "1000x100000", "--batch", "1"],
            "probe_struct_direct")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle"], "mega_rho12_direct")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle", "--perturb", "3"], "mega_rho12_direct_warm")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "2000x200000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle"], "struct_2000_rho12")
    if "mid_rho" in phases:
        # the rho cut applied to the mid rungs' best paths (xl took
        # 161-173x from it; quality guard = gap0 vs the f64 oracle)
        run("scripts/bench_ladder.py",
            ["--rungs", "200x1000", "--solvers",
             "fused-bf16-rs12-c6700,fused-bf16-rs16-c8600"],
            "mid_rho_200")
        run("scripts/bench_ladder.py",
            ["--rungs", "300x1500", "--solvers",
             "blocked-bf16-rs12-c6700,blocked-bf16-rs16-c8600"],
            "mid_rho_300")
    if "stream_10k_rho12" in phases:
        # the dense stream kernel (the 10k rung's best path) with the
        # rho-schedule cut that bought the xl rung 161x
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--dense",
             "--stream", "--rho-step", "12", "--cap", "6700"],
            "stream_10k_rho12")
    if "mega_final" in phases:
        # asymmetric routing (direct gather + two-stage scatter):
        # cold compile, then the perturbed warm measure; rs10 pushes
        # the rho frontier one step further
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle"], "mega_rho12_asym")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle", "--perturb", "5"], "mega_rho12_asym_warm")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "10", "--cap", "5600",
             "--no-oracle", "--perturb", "6"], "mega_rho10")
    if "seg_scratch" in phases:
        # from-scratch 1e5-px policy (every r3/r4 attempt fine-tuned
        # the 1e4-px net and over-fixed; training AT the target
        # resolution is the untried training-time lever), selection
        # under full test semantics; eval with the variant portfolio
        run("experiments/run_seg.py",
            ["-phase", "train", "-num_nodes", "100000",
             "-train_image_list",
             "0,1,4,5,6,7,8,9,10,12,13,15,18,19,20,22",
             "-image_list", "26,28,30,31,35,36,37,38",
             "-num_epochs", "12",
             "-eval_semantics", "full",
             "-refine_iters", "10", "-refine_rounds", "2",
             "-refine_band", "2",
             "-save_dir", "checkpoints_r4/seg_mha_1e5"], "seg_scratch")
        run("scripts/eval_seg_1e5.py",
            ["--variants",
             "masked,masked+ref10,masked+ref10r2b2,masked+ref20r2b2,"
             "masked+ref10r3b3,masked+ref15r2b2",
             "--checkpoint",
             "checkpoints_r4/seg_mha_1e5/checkpoint/"
             "best_checkpoint.npz"], "seg_scratch_eval")
        # two-net x variant portfolio: shipped + scratch
        run("scripts/eval_seg_1e5.py",
            ["--variants", "masked+ref10r2b2,masked+ref10,"
             "masked+ref10r3b3",
             "--checkpoint",
             "checkpoints/seg_mha/checkpoint/best_checkpoint.npz,"
             "checkpoints_r4/seg_mha_1e5/checkpoint/"
             "best_checkpoint.npz"], "seg_scratch_port")
    if "mega_rho10_warm" in phases:
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "10", "--cap", "5600",
             "--no-oracle", "--perturb", "8"], "mega_rho10_warm")
    if "mega_rulefix" in phases:
        # rule-based early fixing (ADMM_lp_iters_fix) at the mega rung
        # with host-side Schur refactorization at each fix event
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rule-fix", "--cap", "20000",
             "--no-oracle"], "mega_rulefix")
    if "mega_rulefix2" in phases:
        # delayed start: only settled variables fix (the raw counters
        # fixed everything infeasibly by iteration 1500)
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rule-fix", "--rule-fix-start", "7000",
             "--cap", "20000", "--no-oracle", "--perturb", "7"],
            "mega_rulefix_s7000")
    if "xl_repeat" in phases:
        # chaos-variance check of the new xl frontier row
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-rs12-c4400-rep"], "xl_rs12_repeat")
    if "struct_10k_direct" in phases:
        # the 10k rung through struct+Schur+direct: m1=1024, m2=1920 --
        # candidate to beat the dense stream's 0.12 inst/s
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--struct",
             "--schur"], "struct_10k_schur")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x10000", "--batch", "8", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--perturb", "4"], "struct_10k_rho12")
    if "seg_multistart" in phases:
        # refine-width x multi-start jitter portfolio (per-image best
        # l2f energy; energies always evaluated on the TRUE problem)
        run("scripts/eval_seg_1e5.py",
            ["--variants",
             "masked,masked+ref10,masked+ref10r2b2,"
             "masked+ref10r2b2+j1,masked+ref10r2b2+j2,"
             "masked+ref10r2b2+j3,masked+ref10+j1,masked+ref10+j2,"
             "masked+ref10r3b3,masked+ref10r3b3+j1"], "seg_multistart")
    if "seg_compact_warm" in phases:
        # cold-vs-warm A/B in one process: the +j1 jitter makes the
        # second run's inputs distinct (dedup hazard) while every jit
        # executable is already compiled -- separates compile cost
        # from execution cost in the 251s compact wall
        run("scripts/eval_seg_1e5.py",
            ["--variants", "compact+ref10r2b2,compact+ref10r2b2+j1"],
            "seg_compact_warm")
    if "seg_compact2" in phases:
        # compacted-vs-masked wall re-measure now that the ELL matvecs
        # ride the (limb-fixed) MXU route on TPU (r3: compact 337s vs
        # masked 57s on the gather lowering -- VERDICT weak 5)
        run("scripts/eval_seg_1e5.py",
            ["--variants", "compact+ref10r2b2"], "seg_compact2")
    if "seg_varport" in phases:
        # per-image refine-variant portfolio (selection from the l2f
        # sides' own energies; refine width measured image-dependent
        # and non-monotonic in r3) -- the remaining lever toward the
        # <=3% 1e5-px target after fine-tune/selection/confidence all
        # failed to close it
        run("scripts/eval_seg_1e5.py",
            ["--variants",
             "masked,masked+ref10,masked+ref10r2b2,masked+ref20r2b2,"
             "masked+ref10r3b3,masked+ref15r2b2"], "seg_varport")
    if "seg_conf" in phases:
        # eval-time fix-confidence sweep at the 1e5-px protocol
        # (VERDICT r3 item 3's untried lever: both nets over-fix):
        # shipped net at raised C, and the full-semantics fine-tune
        # (ft1e5b, over-fixes 89k px) at raised C
        for c in ("0.95", "0.98"):
            run("scripts/eval_seg_1e5.py",
                ["--variants", "masked+ref10r2b2",
                 "--confidence", c], f"seg_conf_{c}")
        run("scripts/eval_seg_1e5.py",
            ["--variants", "masked+ref10r2b2", "--confidence", "0.98",
             "--checkpoint",
             "checkpoints_r3/seg_mha_ft1e5b/checkpoint/"
             "best_checkpoint.npz"], "seg_conf_ft98")
    if "struct_fixed" in phases:
        # after the reduce_precision limb fix: fast payloads should now
        # be f32-grade on chip; Schur ginv kills the 171s/inst host
        # LAPACK build and ~2ms/iter of dense G^-1 streaming
        run("scripts/diag_struct_tpu.py", ["--errors-only"],
            "struct_err_check")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--probe"], "struct_schur_probe")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--cap", "20000", "--no-oracle"],
            "struct_schur_mega")
    if "mega_best" in phases:
        # combine the measured wins: batch amortization + rho18 cut
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "4", "--struct",
             "--schur", "--rho-step", "18", "--cap", "10000",
             "--no-oracle"], "mega_b4_rho18")
    if "mega_rho2" in phases:
        # deeper rho frontier at mega (xl held quality to rs12) +
        # warm-cache repeat of rho18 (the 145.9s wall includes a fresh
        # compile; --perturb defeats the dedup cache on the repeat)
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "18", "--cap", "10000",
             "--no-oracle", "--perturb", "1"], "mega_rho18_warm")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "14", "--cap", "7800",
             "--no-oracle"], "mega_rho14")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle"], "mega_rho12")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "12", "--cap", "6700",
             "--no-oracle", "--perturb", "2"], "mega_rho12_warm")
    if "dense_mega_refix" in phases:
        # post-limb-fix A/B: the r3 'bf16 3-limb fails at m~2e4' ruling
        # (STATUS 2b) is now suspected to be the astype fold, not limb
        # truncation -- one run decides the story
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--dense",
             "--host-ginv", "--no-oracle", "--cap", "20000"],
            "dense_mega_bf16_refix")
    if "probe_struct" in phases:
        run("scripts/probe_struct_ops.py",
            ["--rung", "1000x100000", "--batch", "1"], "probe_struct")
    if "struct_scale" in phases:
        # batch + stretch rungs through the fixed fast path + Schur
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "4", "--struct",
             "--schur", "--cap", "20000", "--no-oracle"],
            "struct_schur_b4")
        run("scripts/bench_sparse_rung.py",
            ["--rung", "2000x200000", "--batch", "1", "--struct",
             "--schur", "--cap", "20000", "--no-oracle"],
            "struct_schur_2000")
    if "mega_rho" in phases:
        # iteration cut at mega: rs18 carried BETTER xl quality than
        # rs20 at a lower cap (ladder.json r4c); cap scaled 18/25 of
        # the observed 13500-iter convergence point
        run("scripts/bench_sparse_rung.py",
            ["--rung", "1000x100000", "--batch", "1", "--struct",
             "--schur", "--rho-step", "18", "--cap", "10000",
             "--no-oracle"], "mega_rho18")
    if "xl_rho2" in phases:
        # push the rs frontier below 18 (rs18-c6500-rep measured 5.0
        # inst/s = 122x CPU at gap0 -7.7%; the quality cliff is not yet
        # visible)
        run("scripts/bench_ladder.py",
            ["--rungs", "800x4000", "--solvers",
             "stream-bf16-rs16-c5800-rep,stream-bf16-rs14-c5100-rep,"
             "stream-bf16-rs12-c4400-rep"], "xl_rho2")
    if "struct_diag" in phases:
        # r4b struct-mega failure discriminator: on-chip matvec errors
        # + exact-vs-fast payload trajectory trace (CPU already
        # exonerated the layout -- scripts/diag_struct_mega.py)
        run("scripts/diag_struct_tpu.py", [], "struct_diag")
    if "cg_bisect" in phases:
        # LAST: a worker crash can wedge the tunnel for ~1h
        run("scripts/diag_cg_crash.py", [], "cg_bisect")


if __name__ == "__main__":
    main()

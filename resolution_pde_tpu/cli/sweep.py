"""Experiment sweep runner — the reference's experiment-sweep surface
(run1.sh: one srun line per experiment, ~180 commented history lines of
model x dataset ladders, run1.sh:92,146-192) as one command per FAMILY:

    python -m resolution_pde_tpu.cli.sweep family=baseline
    python -m resolution_pde_tpu.cli.sweep family=ks_ladder \\
        training.epochs=50 save_figures=false

Every run in the family executes the full driver pipeline (train,
super-resolution sweep, rollout eval, checkpoint) in-process — compiled
programs are shared across runs of the same shape. Pass `isolate=true`
to run each leg in a fresh interpreter instead (with a retrying backend
probe between legs): JAX caches a failed platform init for the process
lifetime, so on a tunneled-TPU backend one transient outage would
otherwise poison every later leg; program reuse across isolated legs
still happens via the persistent compile cache. Per-run results
aggregate into `runs/sweeps/<family>_<ts>/` as a CSV + markdown table
(rows = runs, columns = test loss and per-resolution rel-L2), the
RESULTS.md-style artifact the reference assembles by hand from wandb.
Extra `key=value` args apply to EVERY run in the family.
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import subprocess
import sys
import tempfile
import time
import traceback

# (name, driver, overrides) per run; drivers: '1d' -> main_1d, '2d' -> main_2d
FAMILIES = {
    # The five BASELINE.json canonical config families (BASELINE.md).
    "baseline": [
        ("fno1d_burger_naive", "1d",
         ["model=fno_1d", "dataset=burger_naive"]),
        ("ffno1d_ks_true_mres", "1d",
         ["model=ffno_1d", "dataset=ks_naive_true_mres1"]),
        ("ffno2d_ns_true_mres", "2d",
         ["model=ffno_2d", "dataset=ns_naive_true_mres1"]),
        ("cno2d_ns_resize", "2d",
         ["model=cno_2d", "dataset=ns_naive",
          "training.cno_resize_training=true"]),
        ("s4_ks_window", "1d", ["model=s4_1d", "dataset=ks_s4"]),
    ],
    # KS resolution-strategy ladder (run1.sh's ks_naive/mres/resize/pino
    # experiment history).
    "ks_ladder": [
        (f"ffno1d_{ds}", "1d", ["model=ffno_1d", f"dataset={ds}"])
        for ds in ("ks_naive", "ks_naive_mres", "ks_naive_true_mres1",
                   "ks_resize", "ks_resize_mres", "ks_pino")
    ],
    # Burgers strategy ladder.
    "burger_ladder": [
        (f"ffno1d_{ds}", "1d", ["model=ffno_1d", f"dataset={ds}"])
        for ds in ("burger_naive", "burger_naive_mres",
                   "burger_naive_true_mres", "burger_resize",
                   "burger_resize_mres", "burger_resize_true_mres")
    ],
    # Active-matter time-stride ladder (ns_active_t{2,4,8,16}).
    "ns_active_ladder": [
        (f"ffno2d_{ds}", "2d", ["model=ffno_2d", f"dataset={ds}"])
        for ds in ("ns_active_t2", "ns_active_t4", "ns_active_t8",
                   "ns_active_t16")
    ],
    # 2D model sweep on NS (run1.sh:62-70 cno_original_main exemplars:
    # cno_2d_original / ffno_2d / pos over one NS dataset). Trains at
    # 128^2 (the 256^2 file strided by 2), evaluates 32..256; fixed-size
    # CNO variants pair with resize training/eval as the reference does,
    # pos runs at demo scale (the full Poseidon-B config is a pretrained
    # checkpoint surface, not a from-scratch 20-epoch one).
    "ns_models": [
        ("ffno2d_ns", "2d", ["model=ffno_2d", "dataset=ns_naive",
                             "dataset.dataset_params.reduced_resolution=2",
                             "dataset.rollout_steps=8"]),
        ("cno2d_ns_resize", "2d",
         ["model=cno_2d", "dataset=ns_naive",
          "dataset.dataset_params.reduced_resolution=2",
          "dataset.cno_train_size=128", "training.cno_resize_training=true",
          "dataset.evaluation_type=use_resize",
          "dataset.resize_to_train=true", "dataset.rollout_steps=8"]),
        ("cno2d_original_ns", "2d",
         ["model=cno_2d_original", "dataset=ns_naive",
          "dataset.dataset_params.reduced_resolution=2",
          "dataset.cno_train_size=128",
          "dataset.evaluation_type=use_resize",
          "dataset.resize_to_train=true", "dataset.rollout_steps=8"]),
        ("pos_ns", "2d",
         ["model=pos", "dataset=ns_naive",
          "dataset.dataset_params.reduced_resolution=2",
          "dataset.rollout_steps=8",
          "model.num_channels=1", "model.num_out_channels=1",
          "model.embed_dim=48", "model.depths=[2,2]",
          "model.num_heads=[3,6]", "model.skip_connections=[2,0]",
          "model.window_size=8"]),
    ],
    # Darcy steady-state exemplar (run1.sh:34 `# darcy_fno2d`); data via
    # `cli.generate_data pde=darcy out=data/darcy n=256 resolutions=[128]`.
    "darcy": [
        ("fno2d_darcy", "2d", ["model=fno_2d", "dataset=darcy"]),
        ("ffno2d_darcy", "2d", ["model=ffno_2d", "dataset=darcy"]),
    ],
    # Model ladder on one dataset (the reference's model=<x> sweeps,
    # run1.sh:49-51,87-88 — ffno/unet/s4 over one dataset).
    "ks_models": [
        # CNO is a fixed-size model: the reference always pairs it with
        # use_resize evaluation (every conf/dataset/ks yaml that declares
        # cno_train_size also sets evaluation_type: use_resize) — naive
        # superres would feed it non-train resolutions and crash. The
        # other models keep the plain naive sweep.
        (f"{m}_ks_naive", "1d",
         [f"model={m}", "dataset=ks_naive"] + (
             ["dataset.evaluation_type=use_resize",
              "dataset.resize_to_train=true"] if m == "cno_1d" else []))
        for m in ("fno_1d", "ffno_1d", "cno_1d", "unet_1d")
    ],
}


def _run_one(driver: str, overrides):
    if driver == "1d":
        from resolution_pde_tpu.cli.main_1d import main as drv
    elif driver == "2d":
        from resolution_pde_tpu.cli.main_2d import main as drv
    else:
        raise ValueError(f"unknown driver {driver!r}")
    return drv(list(overrides))


# Flap-tolerant backend probing shared with bench.py; module-level aliases
# kept so tests can monkeypatch sweep._wait_for_backend.
from resolution_pde_tpu.utils.backend_probe import (  # noqa: E402
    child_env as _child_env,
    pin_platform as _pin_platform,
    wait_for_backend as _wait_for_backend,
)
from resolution_pde_tpu.utils.tpu_lock import tpu_lock  # noqa: E402


def _run_one_isolated(driver: str, overrides):
    """Run one leg in a fresh interpreter so device-backend state (init
    failures, HBM fragmentation, a wedged client) cannot leak across legs.
    Compiled-program reuse across legs comes from the persistent XLA
    compile cache, not process state, so isolation costs only interpreter
    startup."""
    fd, out_path = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    code = (
        _pin_platform()
        + "import json, sys\n"
        "from resolution_pde_tpu.cli.sweep import _run_one\n"
        f"out = _run_one({driver!r}, {list(overrides)!r})\n"
        "out.pop('history', None)\n"
        f"json.dump(out, open({out_path!r}, 'w'), default=float)\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], env=_child_env())
        if r.returncode != 0:
            raise RuntimeError(f"isolated {driver} run exited {r.returncode}")
        with open(out_path) as f:
            out = json.load(f)
    finally:
        os.unlink(out_path)
    for k in ("super_resolution", "rollout"):  # JSON stringifies int keys
        if isinstance(out.get(k), dict):
            out[k] = {int(res): v for res, v in out[k].items()}
    return out


def _git_sha() -> str:
    """Short sha of the checked-out framework (best-effort: empty outside
    a git checkout). Stamped into every sweep table so a number in
    RESULTS.md maps to the code that produced it."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        r = subprocess.run(["git", "-C", repo, "rev-parse", "--short",
                            "HEAD"], capture_output=True, timeout=10)
        return r.stdout.decode().strip() if r.returncode == 0 else ""
    except Exception:
        return ""


def _write_tables(out_dir: str, family: str, rows, rehearsal: bool = False,
                  n_total: int = None):
    """rows: [(name, out_dict | None, error | None)]. Produces sweep.csv +
    sweep.md with one row per run and one column per eval resolution.

    Provenance (VERDICT r3 weak #2): per-row platform/epochs/dataset
    columns (from the driver's provenance dict) plus git sha and a
    rehearsal flag, in BOTH files — a 1-epoch CPU rehearsal table must be
    visually distinguishable from a chip reproduction."""
    resolutions = sorted({r for _, out, _ in rows if out
                          for r in out.get("super_resolution", {})})
    roll_res = sorted({r for _, out, _ in rows if out
                       for r in (out.get("rollout") or {})})
    header = (["run", "test_rel_l2"]
              + [f"superres@{r}" for r in resolutions]
              + [f"rollout@{r}" for r in roll_res]
              + ["params_m", "train_s", "platform", "epochs", "dataset",
                 "checkpoint", "error"])
    sha = _git_sha()

    def cells(name, out, err):
        if out is None:
            return [name] + [""] * (len(header) - 3) + ["", err or ""]
        sr = out.get("super_resolution", {})
        ro = out.get("rollout") or {}
        prov = out.get("provenance") or {}
        fmt = lambda v: f"{v:.6f}" if v == v else "nan"  # noqa: E731
        return ([name, fmt(out["test_loss"])]
                + [fmt(sr[r]) if r in sr else "" for r in resolutions]
                + [fmt(ro[r]) if r in ro else "" for r in roll_res]
                + [f"{out['n_params'] / 1e6:.2f}"
                   if out.get("n_params") else "",
                   f"{out['train_seconds']:.0f}"
                   if out.get("train_seconds") else "",
                   str(prov.get("platform", "")),
                   str(prov.get("epochs", "")),
                   str(prov.get("dataset", "")),
                   str(out.get("checkpoint") or ""), ""])

    table = [cells(*row) for row in rows]
    # Family-level health stamp (VERDICT r4 weak #4): a killed/failed leg
    # must be visible at a glance in the committed table, not only as an
    # error cell buried in one row.
    n_green = sum(1 for _, out, _ in rows if out is not None)
    legs_green = f"{n_green}/{n_total if n_total is not None else len(rows)}"
    # per-row sha when the leg self-stamped one (legs run code as-of THEIR
    # start; a long family sweep can span commits), table-level otherwise
    row_shas = [((out or {}).get("provenance") or {}).get("git_sha") or sha
                for _, out, _ in rows]
    with open(os.path.join(out_dir, "sweep.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header + ["git_sha", "rehearsal", "legs_green"])
        w.writerows([row + [rsha, str(rehearsal).lower(), legs_green]
                     for row, rsha in zip(table, row_shas)])
    with open(os.path.join(out_dir, "sweep.md"), "w") as f:
        # drop only the checkpoint-path column; the error column stays so
        # a failed run is distinguishable from "metric not applicable"
        f.write(f"# Sweep: {family}\n\n")
        f.write(f"provenance: git={sha or 'unknown'} "
                f"rehearsal={str(rehearsal).lower()} "
                f"legs_green={legs_green}\n\n")
        md_header = header[:-2] + [header[-1]]
        f.write("| " + " | ".join(md_header) + " |\n")
        f.write("|" + "---|" * len(md_header) + "\n")
        for row in table:
            f.write("| " + " | ".join(row[:-2] + [row[-1]]) + " |\n")
    return header, table


def _write_health_marker(out_dir: str, family: str, n_green: int,
                         n_total: int, detail: str = ""):
    """Drop a visible family-health marker into the run dir: a committed
    table with a dead leg must be flaggable without opening the CSV
    (VERDICT r4 weak #4 — the SIGTERM'd darcy FFNO leg was committed with
    the error cell as its only trace). `.incomplete` lists the failure;
    a later all-green re-run or merge in the same dir removes it."""
    marker = os.path.join(out_dir, ".incomplete")
    if n_green < n_total:
        with open(marker, "w") as f:
            f.write(f"family={family} legs_green={n_green}/{n_total}\n")
            if detail:
                f.write(detail + "\n")
    elif os.path.exists(marker):
        os.unlink(marker)


def merge_tables(argv):
    """`sweep merge out=<dir> <dir1> <dir2> ...` — fold sweep tables into
    one canonical table WITHOUT retraining: later dirs override earlier
    ones per leg name (the `only=` refresh workflow: re-run one fixed leg,
    then merge it over the family's original table). Per-row provenance
    (platform/epochs/dataset/git_sha/rehearsal) is carried verbatim, so a
    merged table shows exactly which code produced each row."""
    out_dir = None
    srcs = []
    for a in argv:
        if a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        else:
            srcs.append(a)
    if out_dir is None or len(srcs) < 2:
        raise SystemExit(
            "usage: sweep merge out=<dir> <dir1> <dir2> ... "
            "(later dirs override earlier per leg name)")

    rows = {}  # leg name -> dict row, first-seen order (dict preserves it)
    for src in srcs:
        path = os.path.join(src, "sweep.csv")
        with open(path, newline="") as f:
            for r in csv.DictReader(f):
                # REPLACE the whole row (keeping its first-seen position),
                # never field-merge: a metric the refreshed run did not
                # measure must come out empty, not survive from the old run
                # under the new row's git_sha
                r.pop("legs_green", None)  # family-level; recomputed below
                rows[r["run"]] = dict(r)
    # Health of the MERGED table (a stale source row's legs_green would
    # misreport the fold): green = the row has no error cell.
    n_green = sum(1 for r in rows.values() if not r.get("error"))
    legs_green = f"{n_green}/{len(rows)}"
    for r in rows.values():
        r["legs_green"] = legs_green

    def _res_cols(prefix):
        res = {int(k.split("@", 1)[1]) for r in rows.values() for k in r
               if k.startswith(prefix) and r[k]}
        return [f"{prefix}{n}" for n in sorted(res)]

    header = (["run", "test_rel_l2"] + _res_cols("superres@")
              + _res_cols("rollout@")
              + ["params_m", "train_s", "platform", "epochs", "dataset",
                 "checkpoint", "error", "git_sha", "rehearsal",
                 "legs_green"])
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "sweep.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        for r in rows.values():
            w.writerow([r.get(c) or "" for c in header])
    _write_health_marker(out_dir, "merged", n_green, len(rows),
                         detail="merged from: " + " ".join(srcs))
    with open(os.path.join(out_dir, "sweep.md"), "w") as f:
        f.write("# Sweep: merged\n\n")
        f.write(f"legs_green: {legs_green}\n\n")
        f.write("merged from: " + " ".join(srcs)
                + " (later override earlier per leg)\n\n")
        md_header = [c for c in header if c != "checkpoint"]
        f.write("| " + " | ".join(md_header) + " |\n")
        f.write("|" + "---|" * len(md_header) + "\n")
        for r in rows.values():
            f.write("| " + " | ".join(r.get(c) or "" for c in md_header)
                    + " |\n")
    print(f"merged {len(srcs)} tables ({len(rows)} legs) -> "
          f"{out_dir}/sweep.csv")
    return rows


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if argv and argv[0] == "merge":
        return merge_tables(argv[1:])
    family = "baseline"
    isolate = False
    rehearsal = False
    only = None
    extras = []
    for a in argv:
        if a.startswith("family="):
            family = a.split("=", 1)[1]
        elif a.startswith("isolate="):
            isolate = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        elif a.startswith("rehearsal="):
            # set by scripts/rehearse_family.py: stamps the tables so a
            # tiny-scale rehearsal is never mistaken for a chip result
            rehearsal = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        elif a.startswith("only="):
            # comma-separated leg names: re-run a subset of a family
            # (e.g. after a fix) without repeating the whole sweep
            only = set(a.split("=", 1)[1].split(","))
        else:
            extras.append(a)
    if family not in FAMILIES:
        raise SystemExit(
            f"unknown family {family!r}; available: {sorted(FAMILIES)}")
    legs = FAMILIES[family]
    if only is not None:
        unknown = only - {name for name, _, _ in legs}
        if unknown:
            raise SystemExit(
                f"unknown legs {sorted(unknown)} for family {family!r}; "
                f"available: {[n for n, _, _ in legs]}")
        legs = [leg for leg in legs if leg[0] in only]

    out_dir = os.path.join("runs", "sweeps", f"{family}_{int(time.time())}")
    os.makedirs(out_dir, exist_ok=True)

    rows = []
    with contextlib.ExitStack() as stack:
        if not isolate:
            # In-process legs initialize JAX in THIS interpreter, and the
            # TPU client stays attached for the process lifetime — so a
            # per-leg lock release would hand the chip to a queued waiter
            # (which tpu_lock's blocked-flock handoff guarantees wins)
            # while our client is still live: two concurrent TPU
            # processes, the exact wedge the lock exists to prevent.
            # Non-isolate holds ONE lock for the whole family.
            stack.enter_context(tpu_lock(f"sweep:{family}"))
        for name, driver, overrides in legs:
            print(f"=== sweep[{family}] run {name}: "
                  f"{' '.join(overrides + extras)}", flush=True)
            # Per-leg checkpoint dirs via the job-id path component
            # (cli/common.run_checkpoint_path, mirroring the reference's
            # SLURM_JOB_ID layout): without this every ffno_1d-on-KS leg
            # of a ladder overwrites checkpoints/ffno1d/ks_local, and the
            # multi-checkpoint eval drivers have nothing to compare.
            os.environ["SLURM_JOB_ID"] = name
            try:
                if isolate:
                    # each leg is a subprocess with its own client, so
                    # chip access CAN be serialized per leg — a queued
                    # independent TPU process (bench.py) gets a slot at
                    # the next leg boundary
                    with tpu_lock(f"sweep:{family}:{name}"):
                        _wait_for_backend()
                        out = _run_one_isolated(driver, overrides + extras)
                else:
                    out = _run_one(driver, overrides + extras)
                rows.append((name, out, None))
            except Exception as e:  # defensive per-run guard: one failing
                traceback.print_exc()  # run must not kill the family sweep
                rows.append((name, None, f"{type(e).__name__}: {e}"))
            # Incremental durability: rewrite the table after EVERY leg so
            # a family killed mid-sweep (end-of-round SIGTERM, VM loss)
            # leaves its completed rows on disk instead of only in this
            # process's memory. The final write below is then a no-op
            # refresh; .incomplete marks the table non-green meanwhile.
            _write_tables(out_dir, family, rows, rehearsal=rehearsal,
                          n_total=len(legs))
            _write_health_marker(
                out_dir, family,
                sum(1 for _, o, _ in rows if o is not None), len(legs),
                detail="family still running; completed legs: " + " ".join(
                    n for n, o, _ in rows if o is not None))

    header, table = _write_tables(out_dir, family, rows,
                                  rehearsal=rehearsal)
    _write_health_marker(
        out_dir, family, sum(1 for _, out, _ in rows if out is not None),
        len(rows), detail="failed legs: " + " ".join(
            n for n, out, _ in rows if out is None))
    if only is None and not rehearsal and all(out is not None
                                              for _, out, _ in rows):
        # Durable all-legs-green marker: /tmp stamp files die with the VM,
        # but this rides the committed run dir, so the shell launchers can
        # skip an already-reproduced family across machine resets.
        with open(os.path.join(out_dir, ".ok"), "w") as f:
            f.write(f"family={family} legs={len(rows)} "
                    f"sha={_git_sha()} extras={' '.join(extras)}\n")
    print(f"\nsweep results -> {out_dir}/sweep.csv")
    cols = list(range(len(header) - 2)) + [len(header) - 1]  # skip ckpt path
    widths = [max(len(header[i]), max((len(r[i]) for r in table), default=0))
              for i in cols]
    print("  ".join(header[i].ljust(w) for i, w in zip(cols, widths)))
    for row in table:
        print("  ".join(row[i].ljust(w) for i, w in zip(cols, widths)))
    failed = [n for n, out, _ in rows if out is None]
    if failed:
        print(f"FAILED runs: {failed}")
    return {name: out for name, out, _ in rows}


if __name__ == "__main__":
    # Nonzero exit when any leg failed, so launchers (e.g. the resumable
    # ladder tail's stamp files) can distinguish a clean family from one
    # that needs a retry; tables are still written either way.
    results = main()
    sys.exit(0 if all(v is not None for v in results.values()) else 1)

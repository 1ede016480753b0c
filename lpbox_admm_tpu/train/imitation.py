"""Imitation-learning trainer for the early-fixing policy.

TPU-native equivalent of the reference's ``PolicyKL``
(LinerProgramming/LinearProgramming/trainer.py): the converged plain-ADMM
solution labels each variable, and the policy is trained with weighted
BCE on per-variable trajectory windows:

* trajectory dataset      ~ readFile/getLabel/getSubset   (:32-98)
* episode batch assembly  ~ _train_mha_100                (:254-299)
  (10 episodes of ws=100, per-episode weight 1/i, reshaped
   (10*n, 20, ws/20), labels tiled)
* weighted BCE            ~ nn.BCEWithLogitsLoss(weight)  (:292)
* optimizer               ~ Adam lr 1e-4 + StepLR(2000, 0.5) (run.py:44-45)
* in-loop eval            ~ _valid_1 / _valid_2           (:354-597)
* checkpointing           ~ train() epoch/best checkpoints (:599-643)

Design delta: the reference loops instances one at a time from CSV files
on disk; here trajectories are generated on device by the batched solver
and the gradient step runs over an instance mini-batch -- no file
round-trips (SURVEY.md section 7).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import LP_CONFIG, PolicyConfig, SolverConfig
from ..core import lp
from ..core.problem import LpProblem
from .l2f import l2f_metrics, l2f_solve


class TrajectoryDataset(NamedTuple):
    """Recorded plain-ADMM trajectories + converged labels."""

    traj: jnp.ndarray      # (B, n, T) first T iterations of plain ADMM
    labels: jnp.ndarray    # (B, n) converged solution (0/1)
    var_mask: jnp.ndarray  # (B, n)
    oracle_obj: jnp.ndarray    # (B,) converged plain objective
    oracle_iters: jnp.ndarray  # () iterations the plain solve took
    oracle_wall_s: float = 0.0  # wall time of the plain batch solve
    # optional per-variable BCE weight (fix-error-aware training,
    # VERDICT r2 item 1); None = uniform (reference semantics)
    damage: Optional[jnp.ndarray] = None   # (B, n)


def damage_weights(prob: LpProblem, labels: jnp.ndarray,
                   alpha: float = 0.5) -> jnp.ndarray:
    """Per-variable downstream damage of a WRONG fix, as a BCE weight.

    The objective-gap tail is a handful of locked-in wrong fixes on
    load-bearing bids (STATUS r2 issue 1); uniform BCE spends the same
    capacity on a $2 bid as a $200 one.  Estimated from the oracle
    solution:

    * oracle-1 bids: wrongly fixing to 0 drops the bid -> |b_j|
      (the refill repair rarely recovers a carved-out support bid);
    * oracle-0 bids: wrongly fixing to 1 displaces the selected
      occupiers of every row the bid needs -> sum of their prices
      minus the entering bid's own price, floored at a small value
      (capacity-1 CA rows; the same occupier logic as
      ops/repair.swap_repair).

    Returned normalized to mean 1 over valid variables, raised to
    ``alpha`` (0.5 default: damps the x100 price range so cheap bids
    still train).
    """
    absb = jnp.abs(prob.b)
    sel = (labels > 0.5).astype(jnp.float32) * prob.var_mask
    # price of the selected occupier per row (0 if uncovered)
    row_price = jnp.einsum("bmn,bn->bm", prob.E, sel * absb,
                           preferred_element_type=jnp.float32)
    disp = jnp.einsum("bmn,bm->bn", prob.E, row_price,
                      preferred_element_type=jnp.float32)
    floor = 0.05 * jnp.mean(jnp.where(prob.var_mask, absb, 0.0),
                            axis=-1, keepdims=True)
    dmg = jnp.where(sel > 0.5, absb,
                    jnp.maximum(disp - absb, floor))
    dmg = jnp.where(prob.var_mask, dmg, 0.0)
    mean = jnp.sum(dmg, axis=-1, keepdims=True) \
        / jnp.maximum(jnp.sum(prob.var_mask, axis=-1, keepdims=True), 1)
    w = (dmg / jnp.maximum(mean, 1e-9)) ** alpha
    return jnp.where(prob.var_mask, w, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg", "record_iters"))
def _record_then_converge(prob: LpProblem, cfg: SolverConfig,
                          record_iters: int):
    state = lp.init_state(prob, cfg)
    state, traj = lp.solve_window(state, prob, cfg, record_iters,
                                  record=True, skip_cvg_at=0)

    def cond(s):
        return jnp.logical_and(s.it < cfg.max_iters, ~jnp.all(s.done))

    def body(s):
        s, _ = lp.solve_window(s, prob, cfg, 100, record=False)
        return s

    state = jax.lax.while_loop(cond, body, state)
    return state, traj


def build_dataset(prob: LpProblem, cfg: SolverConfig,
                  record_iters: int = 1000,
                  damage_alpha: Optional[float] = None
                  ) -> TrajectoryDataset:
    """Run plain ADMM, recording the first ``record_iters`` iterations
    (the reference's xiter CSVs) and the converged rounding as labels
    (getLabel: final iterate >= 0.5, trainer.py:80-90).

    ``oracle_obj`` is the plain solve's REPORTED objective -- the
    better of (last rounding, best feasible incumbent), matching what
    solve callers report via select_solution -- so l2f objective gaps
    compare equal reporting semantics on both sides.
    ``oracle_wall_s`` times the plain batch solve, giving the
    denominator of the reference's time-speedup (trainer.py:560)."""
    t0 = time.perf_counter()
    state, traj = _record_then_converge(prob, cfg, record_iters)
    jax.block_until_ready(state.x)
    wall = time.perf_counter() - t0
    labels = lp.solution(state)
    _, oracle, _ = jax.jit(lp.select_solution)(
        prob, labels, lp.solution_best(state))
    dmg = (jax.jit(damage_weights, static_argnames=("alpha",))(
        prob, labels, alpha=damage_alpha)
        if damage_alpha is not None else None)
    return TrajectoryDataset(
        traj=traj, labels=labels, var_mask=prob.var_mask,
        oracle_obj=oracle, oracle_iters=state.it, oracle_wall_s=wall,
        damage=dmg)


def episode_batch(ds: TrajectoryDataset, pcfg: PolicyConfig, ws: int,
                  n_episodes: int = 10
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble the (E*B*n, node, chunk) training batch.

    Episode i covers trajectory columns [(i-1)*ws, i*ws) with weight 1/i
    (trainer.py:272-285); rows of padded variables get weight 0.
    """
    from .l2f import traj_to_tokens

    traj = ds.traj.reshape(ds.traj.shape[0], -1, ds.traj.shape[-1])
    B, n, T = traj.shape
    assert n_episodes * ws <= T, (n_episodes, ws, T)
    xs, wts = [], []
    per_var = ds.var_mask.reshape(B * n).astype(jnp.float32)
    if ds.damage is not None:
        # fix-error-aware BCE: scale each variable's weight by its
        # wrong-fix damage (damage_weights; mean 1 over valid vars)
        per_var = per_var * ds.damage.reshape(B * n)
    for i in range(1, n_episodes + 1):
        sub = traj[:, :, (i - 1) * ws:i * ws]           # (B, n, ws)
        xs.append(traj_to_tokens(sub.reshape(B * n, ws), pcfg))
        wts.append(jnp.full((B * n,), 1.0 / i) * per_var)
    x = jnp.concatenate(xs, axis=0)
    weight = jnp.concatenate(wts, axis=0)
    labels = jnp.tile(ds.labels.reshape(B * n), (n_episodes,))
    return x, labels, weight


def build_dataset_qp(prob, cfg: SolverConfig,
                     record_iters: int = 50,
                     repair_sweeps: int = 0,
                     pair_sweeps: int = 0) -> TrajectoryDataset:
    """Segmentation variant of build_dataset: grid trajectories flattened
    to (B, H*W, T); oracle = full energy of the plain solve
    (Seg trainer.py readFile/getLabel + xiter_all.csv oracle)."""
    from ..core import qp as qp_core

    state = qp_core.init_state(prob, cfg)
    state, traj = qp_core.solve_window(state, prob, cfg, record_iters,
                                       record=True)

    def cond(s):
        return jnp.logical_and(s.it < cfg.max_iters, ~jnp.all(s.done))

    def body(s):
        s, _ = qp_core.solve_window(s, prob, cfg, 50, record=False)
        return s

    state = jax.lax.while_loop(cond, body, state)
    B = prob.batch
    labels = qp_core.solution(state)
    # oracle = the REPORTED plain energy (best of last/incumbent,
    # optionally ICM-polished), so l2f gaps compare equal reporting
    # semantics (see build_dataset)
    _, oracle = jax.jit(functools.partial(
        qp_core.select_solution, repair_sweeps=repair_sweeps,
        pair_sweeps=pair_sweeps))(state, prob)
    return TrajectoryDataset(
        traj=traj.reshape(B, -1, record_iters),
        labels=labels.reshape(B, -1),
        var_mask=prob.mask.reshape(B, -1),
        oracle_obj=oracle,
        oracle_iters=state.it)


def weighted_bce(logits: jnp.ndarray, labels: jnp.ndarray,
                 weight: jnp.ndarray) -> jnp.ndarray:
    """torch BCEWithLogitsLoss(weight=w) semantics: mean over all
    elements of w * bce(logit, label)."""
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    return jnp.mean(weight * bce)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _path_leaves(tree) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(jax.device_get(leaf))
    return out


def checkpoint_arrays(ts: TrainState, epoch: int) -> Dict[str, np.ndarray]:
    """Flatten a TrainState into a dict of plain arrays for np.savez."""
    arrs = {}
    for k, v in _path_leaves({"params": ts.params,
                              "batch_stats": ts.batch_stats}).items():
        arrs["v/" + k] = v
    for i, leaf in enumerate(jax.tree_util.tree_leaves(ts.opt_state)):
        arrs[f"opt/{i:04d}"] = np.asarray(jax.device_get(leaf))
    arrs["step"] = np.asarray(int(ts.step))
    arrs["epoch"] = np.asarray(int(epoch))
    return arrs


def load_checkpoint(path: str, tx: optax.GradientTransformation
                    ) -> TrainState:
    """Load an .npz checkpoint written by PolicyTrainer.save.

    ``allow_pickle`` stays False: loading a checkpoint can never execute
    code.  ``tx`` must be the same optimizer the state was saved with
    (its treedef re-hangs the saved opt leaves).
    """
    z = np.load(path, allow_pickle=False)

    def insert(root, parts, val):
        for p in parts[:-1]:
            root = root.setdefault(p, {})
        root[parts[-1]] = jnp.asarray(val)

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for k in z.files:
        if k.startswith("v/params/"):
            insert(params, k[len("v/params/"):].split("/"), z[k])
        elif k.startswith("v/batch_stats/"):
            insert(batch_stats, k[len("v/batch_stats/"):].split("/"),
                   z[k])
    template = tx.init(params)
    tleaves, tdef = jax.tree_util.tree_flatten(template)
    okeys = sorted(k for k in z.files if k.startswith("opt/"))
    assert len(okeys) == len(tleaves), (len(okeys), len(tleaves))
    opt_state = jax.tree_util.tree_unflatten(
        tdef, [jnp.asarray(z[k]) for k in okeys])
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state,
                      step=jnp.int32(int(z["step"])))


class PolicyTrainer:
    """Orchestrates imitation training + in-loop l2f evaluation
    (the reference's PolicyKL class)."""

    def __init__(self, model, pcfg: PolicyConfig,
                 cfg: SolverConfig = LP_CONFIG, ws: int = 100,
                 save_dir: Optional[str] = None,
                 micro_rows: int = 16384):
        self.model = model
        self.pcfg = pcfg
        self.cfg = cfg
        self.ws = ws
        self.save_dir = save_dir
        # microbatch size for gradient accumulation: the MHA's (node,
        # node) attention tiles pad badly on TPU, so large episode
        # batches are chunked row-wise
        self.micro_rows = micro_rows
        schedule = optax.exponential_decay(
            pcfg.lr, transition_steps=pcfg.lr_decay_step,
            decay_rate=pcfg.lr_decay_factor, staircase=True)
        self.tx = optax.adam(schedule)
        self._train_step = jax.jit(self._train_step_impl)

    def init(self, rng: jax.Array, sample: jnp.ndarray) -> TrainState:
        variables = self.model.init(rng, sample, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=self.tx.init(params),
                          step=jnp.int32(0))

    def variables(self, ts: TrainState) -> Dict[str, Any]:
        v = {"params": ts.params}
        if ts.batch_stats:
            v["batch_stats"] = ts.batch_stats
        return v

    def _train_step_impl(self, ts: TrainState, x, labels, weight):
        R = x.shape[0]
        n_total = jnp.float32(R)

        def chunk_loss(params, stats, xc, lc, wc):
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            out, mutated = self.model.apply(
                variables, xc, train=True, mutable=["batch_stats"])
            logits, _ = out
            bce = weighted_bce(logits[:, 0], lc, wc)
            # scale so the sum over chunks equals the full-batch mean
            loss = bce * (xc.shape[0] / n_total)
            return loss, mutated.get("batch_stats", {})

        if R <= self.micro_rows:
            (loss, new_stats), grads = jax.value_and_grad(
                chunk_loss, has_aux=True)(ts.params, ts.batch_stats,
                                          x, labels, weight)
        else:
            # gradient accumulation over row chunks (the padded
            # attention activations of the full batch OOM on TPU)
            pad = (-R) % self.micro_rows
            xc = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            lc = jnp.pad(labels, (0, pad))
            wc = jnp.pad(weight, (0, pad))   # pad rows carry 0 weight
            k = xc.shape[0] // self.micro_rows
            xc = xc.reshape(k, self.micro_rows, *x.shape[1:])
            lc = lc.reshape(k, self.micro_rows)
            wc = wc.reshape(k, self.micro_rows)

            def body(carry, inp):
                loss_acc, grads_acc, stats = carry
                xi, li, wi = inp
                (l, new_stats), g = jax.value_and_grad(
                    chunk_loss, has_aux=True)(ts.params, stats, xi, li,
                                              wi)
                grads_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, grads_acc, g)
                return (loss_acc + l, grads_acc, new_stats), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, ts.params)
            (loss, grads, new_stats), _ = jax.lax.scan(
                body, (jnp.float32(0.0), zero_grads, ts.batch_stats),
                (xc, lc, wc))

        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=ts.step + 1), loss

    def train_epoch(self, ts: TrainState,
                    datasets: Iterable[TrajectoryDataset],
                    n_episodes: int = 10) -> Tuple[TrainState, float]:
        """One pass over the instance datasets; one optimizer step per
        dataset chunk (the reference steps once per instance with all
        episodes concatenated, trainer.py:268-297)."""
        losses = []
        for ds in datasets:
            x, labels, weight = episode_batch(ds, self.pcfg, self.ws,
                                              n_episodes)
            ts, loss = self._train_step(ts, x, labels, weight)
            losses.append(float(loss))
        return ts, float(np.mean(losses))

    def evaluate(self, ts: TrainState, prob: LpProblem,
                 ds: TrajectoryDataset, max_iter: Optional[int] = None,
                 compact: bool = False) -> Dict[str, Any]:
        """In-loop l2f evaluation against the plain-ADMM oracle
        (_valid_1/_valid_2 semantics: obj gap, speedup, fix errors).

        ``compact=True`` uses the physically-compacting three-phase
        solver (wall-clock-representative); the default mask-only loop
        is cheaper to compile for in-training eval."""
        t0 = time.perf_counter()
        if compact:
            from .l2f import l2f_solve_compact
            state, out_c = l2f_solve_compact(
                prob, self.model, self.variables(ts), self.cfg,
                self.pcfg, ws=self.ws, max_iter=max_iter)
            np.asarray(out_c["solution"])
            wall = time.perf_counter() - t0
            obj = np.asarray(out_c["obj"])
            gap = (obj - np.asarray(ds.oracle_obj)) \
                / np.abs(np.asarray(ds.oracle_obj))
            out = {
                "obj": obj, "obj_gap": gap,
                "iterations": out_c["iterations"],
                "infeasible": np.asarray(out_c["infeasible"]),
                "n_fixed": np.asarray(out_c["n_fixed"]),
                "fix_errors": np.asarray(jnp.sum(
                    out_c["fixed_mask"]
                    & (out_c["fixed_val"] != ds.labels), axis=-1)),
            }
        else:
            state = l2f_solve(prob, self.model, self.variables(ts),
                              self.cfg, self.pcfg, ws=self.ws,
                              max_iter=max_iter)
            state.x.block_until_ready()
            wall = time.perf_counter() - t0
            m = l2f_metrics(state, prob, ds.oracle_obj, ds.labels)
            out = {k: np.asarray(v) for k, v in m.items()}
        out["wall_time_s"] = wall
        out["mean_obj_gap"] = float(np.mean(np.asarray(out["obj_gap"])))
        out["iter_speedup"] = float(ds.oracle_iters) / max(
            float(out["iterations"]), 1)
        # the reference's headline speedup = plain time / l2f time
        # (trainer.py:560); meaningful when ds was built in this process
        # on the same backend
        if float(ds.oracle_wall_s) > 0:
            out["time_speedup"] = float(ds.oracle_wall_s) / max(wall,
                                                               1e-9)
        return out

    # ---- checkpointing (reference trainer.py:599-643) -------------------
    # Checkpoints are plain .npz archives of array leaves (no pickle:
    # a checkpoint must not be able to execute code on load).  The
    # params/batch_stats dicts are stored path-keyed; the optimizer
    # state is stored as ordered leaves and re-hung on the treedef of a
    # freshly-initialized optimizer for the loaded params.
    def save(self, ts: TrainState, epoch: int, best: bool = False):
        if not self.save_dir:
            return
        os.makedirs(os.path.join(self.save_dir, "checkpoint"), exist_ok=True)
        name = "best_checkpoint.npz" if best else f"checkpoint_{epoch}.npz"
        path = os.path.join(self.save_dir, "checkpoint", name)
        arrs = checkpoint_arrays(ts, epoch)
        with open(path, "wb") as f:
            np.savez(f, **arrs)

    def load(self, path: str) -> TrainState:
        return load_checkpoint(path, self.tx)

    def train(self, ts: TrainState, datasets, eval_prob: LpProblem,
              eval_ds: TrajectoryDataset, num_epochs: Optional[int] = None,
              log=print) -> TrainState:
        """Full training loop with per-epoch eval + best checkpointing."""
        if num_epochs is None:
            num_epochs = self.pcfg.num_epochs
        best_gap = None
        for epoch in range(num_epochs):
            ts, loss = self.train_epoch(ts, datasets)
            metrics = self.evaluate(ts, eval_prob, eval_ds)
            gap = metrics["mean_obj_gap"]
            log(f"epoch {epoch}: loss={loss:.5f} obj_gap={gap:+.4f} "
                f"iter_speedup={metrics['iter_speedup']:.2f}x "
                f"fixed={metrics['n_fixed'].mean():.0f}")
            self.save(ts, epoch)
            if best_gap is None or gap < best_gap:
                best_gap = gap
                self.save(ts, epoch, best=True)
        return ts

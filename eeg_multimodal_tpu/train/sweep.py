"""Batched sweep engine: train every sweep member in one vmapped program.

The reference runs its grids sequentially — 20 epsilon values one after the
other (compare_privacy_budget.py:50-56), alpha sweeps (train_val.py:532-543),
index-selected eps runs (past_acc.py:255-258). On TPU the entire grid is one
XLA program: member configs (epsilon, seed) stack on a leading axis, params
and optimizer states stack with them, and ``jax.vmap`` over the jitted
epoch-scan trains all members at once — the BASELINE.json "batched eps sweep
{0.1,1,3,5,10} x seeds" north star. Epoch shuffles are shared across members
(the reference reseeds 980616 before every run, so its members see identical
shuffle orders too).

Memory note: BERT-base members cost ~1.3 GB each (f32 params + Adam moments);
a 16 GB v5e chip fits ~10. Larger grids chunk automatically (a log line
reports the chunking — no silent cap).

Mesh composition: pass ``mesh=`` to place sweep members along the mesh's
'data' axis — every stacked state (params, Adam moments, epsilons, keys)
shards its leading member axis across the data-axis device groups while the
(small) dataset replicates, so the grid scales linearly with chips and no
cross-member collectives are needed. This composes the two flagship
parallelism features (vmapped sweeps x device mesh).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..data.datasets import MultiModalArrays, epoch_indices
from ..models import fusion
from ..parallel.mesh import DATA_AXIS
from ..utils.seeding import key_chain, set_seed
from . import metrics as M
from .records import RunRecorder
from .trainer import StepFunctions, TrainConfig


@dataclasses.dataclass
class SweepMember:
    epsilon: float
    seed: int = 980616
    label: Optional[str] = None

    @property
    def name(self) -> str:
        return self.label or f"eps{self.epsilon}_seed{self.seed}"


class SweepRunner:
    def __init__(
        self,
        fusion_cfg: fusion.FusionConfig,
        train_cfg: TrainConfig,
        members: Sequence[SweepMember],
        bert_params=None,
        max_members_in_flight: int = 10,
        mesh: Optional[Mesh] = None,
    ):
        self.fusion_cfg = fusion_cfg
        self.train_cfg = train_cfg
        self.members = list(members)
        self.bert_params = bert_params
        self.chunk = max_members_in_flight
        self.mesh = mesh
        self._member_deg = 1
        if mesh is not None:
            self._member_deg = mesh.shape[DATA_AXIS]
            # chunks must tile the data axis evenly
            self.chunk = max(self._member_deg,
                             self.chunk - self.chunk % self._member_deg)
        self.steps = StepFunctions(fusion_cfg, train_cfg)
        s = self.steps
        self._vtrain = jax.jit(
            jax.vmap(s._train_epoch, in_axes=(0, 0, 0, None, None, None, 0, 0)),
            # donate stacked member states: without aliasing, S members'
            # params + Adam moments double-buffer (~2.6 GB per member)
            donate_argnums=(0, 1, 2),
        )
        self._veval = jax.jit(
            jax.vmap(s._eval_epoch, in_axes=(0, None, None, None, 0, 0))
        )

    # -- mesh placement -------------------------------------------------------
    def _member_sharding(self):
        """Leading (member) axis on 'data'; everything else replicated."""
        return NamedSharding(self.mesh, PartitionSpec(DATA_AXIS))

    def _place_stacked(self, tree):
        if self.mesh is None:
            return tree
        s = self._member_sharding()
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def _place_replicated(self, tree):
        if self.mesh is None:
            return tree
        s = NamedSharding(self.mesh, PartitionSpec())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def _init_members(self, members: Sequence[SweepMember]):
        keys = self._place_stacked(jnp.stack(
            [key_chain(set_seed(m.seed), "init") for m in members]
        ))
        # bert_params must be a jit ARGUMENT, not a closure constant: baked
        # in, a BERT-base tree becomes ~350 MB of program constants, which
        # the axon remote-compile tunnel rejects (HTTP 413 / EOF)
        if self.bert_params is not None:
            init_one = lambda k, bp: fusion.init(k, self.fusion_cfg, bp)
            params = jax.jit(jax.vmap(init_one, in_axes=(0, None)))(
                keys, self.bert_params
            )
        else:
            init_one = lambda k: fusion.init(k, self.fusion_cfg, None)
            params = jax.jit(jax.vmap(init_one))(keys)
        if self.mesh is not None:
            params = self._place_stacked(params)
        dp_os, model_os = jax.vmap(self.steps.init_opt_states)(params)
        return params, dp_os, model_os

    def run(
        self,
        train_data: MultiModalArrays,
        test_data: MultiModalArrays,
        log_root: Optional[str] = None,
        echo: bool = True,
    ) -> List[Dict[str, Any]]:
        members = list(self.members)
        pad = 0
        if self._member_deg > 1 and len(members) % self._member_deg:
            # pad the grid so every chunk tiles the data axis; padded
            # members are copies whose results are dropped below. The
            # "__pad__" label keeps them out of the recorders — the copy
            # shares the real member's name, and a second RunRecorder on the
            # same directory would append duplicate epoch rows.
            pad = self._member_deg - len(members) % self._member_deg
            members = members + [
                dataclasses.replace(members[-1], label="__pad__")
            ] * pad
        n_chunks = -(-len(members) // self.chunk)
        if echo and n_chunks > 1:
            print(
                f"[sweep] {len(self.members)} members exceed "
                f"max_members_in_flight={self.chunk}: running {n_chunks} "
                f"sequential chunks"
            )
        out: List[Dict[str, Any]] = []
        for i in range(0, len(members), self.chunk):
            out.extend(
                self._run_chunk(
                    members[i : i + self.chunk],
                    train_data, test_data, log_root, echo,
                )
            )
        return out[: len(self.members)]

    def _run_chunk(self, members, train_data, test_data, log_root, echo):
        cfg = self.train_cfg
        S = len(members)
        params, dp_os, model_os = self._init_members(members)
        epsilons = self._place_stacked(
            jnp.asarray([m.epsilon for m in members], jnp.float32)
        )
        member_keys = [set_seed(m.seed) for m in members]
        train_dev = self._place_replicated(train_data.device_put())
        test_dev = self._place_replicated(test_data.device_put())
        n_train, n_test = len(train_data), len(test_data)

        recorders = [
            RunRecorder(f"{log_root}/{m.name}/", echo=False)
            if log_root and m.label != "__pad__" else None
            for m in members
        ]
        f1_best = [cfg.f1_best_init] * S
        best: List[Optional[Dict]] = [None] * S
        histories: List[List[Dict]] = [[] for _ in members]

        shuffle_key = key_chain(set_seed(members[0].seed), "epoch")
        for epoch in range(cfg.epochs):
            t0 = time.time()
            ek = jax.random.fold_in(shuffle_key, epoch)
            k_shuffle, k_eval_order = jax.random.split(ek)
            idx, w = epoch_indices(k_shuffle, n_train, cfg.batch_size)
            tkeys = jnp.stack(
                [
                    jax.random.fold_in(key_chain(k, "train"), epoch)
                    for k in member_keys
                ]
            )
            params, dp_os, model_os, tr_loss, tr_acc = self._vtrain(
                params, dp_os, model_os, train_dev, idx, w, epsilons, tkeys
            )
            eidx, ew = epoch_indices(k_eval_order, n_test, cfg.batch_size, shuffle=False)
            ekeys = jnp.stack(
                [
                    jax.random.fold_in(key_chain(k, "eval"), epoch)
                    for k in member_keys
                ]
            )
            te_loss, te_acc, preds, labels, _, ws = self._veval(
                params, test_dev, eidx, ew, epsilons, ekeys
            )
            jax.block_until_ready(te_loss)
            dt = time.time() - t0

            preds_np, labels_np, ws_np = map(np.asarray, (preds, labels, ws))
            for s, m in enumerate(members):
                sel = ws_np[s] > 0
                f1 = M.f1_binary(preds_np[s][sel], labels_np[s][sel])
                row = dict(
                    epoch=epoch + 1,
                    train_loss=float(tr_loss[s]), train_acc=float(tr_acc[s]),
                    test_loss=float(te_loss[s]), test_acc=float(te_acc[s]),
                    f1=float(f1), time_cost=dt, epsilon=m.epsilon, seed=m.seed,
                )
                histories[s].append(row)
                rec = None
                if recorders[s]:
                    rec = recorders[s].epoch(
                        epoch, row["train_loss"], row["train_acc"],
                        row["test_loss"], row["test_acc"], f1, dt,
                        extra={"epsilon": m.epsilon, "seed": m.seed},
                    )
                if f1 > f1_best[s]:
                    f1_best[s] = f1
                    best[s] = row
                    if recorders[s] and rec:
                        recorders[s].best_record(rec)
            if echo:
                accs = " ".join(f"{float(a):.3f}" for a in te_acc)
                print(
                    f"[sweep] epoch {epoch + 1}/{cfg.epochs} "
                    f"({dt:.1f}s, {S} members) test_acc: {accs}"
                )

        return [
            {
                "member": dataclasses.asdict(m),
                "history": histories[s],
                "best": best[s],
                "f1_best": f1_best[s],
            }
            for s, m in enumerate(members)
        ]


def privacy_utility_frontier(
    epsilons: Sequence[float] = (0.1, 1.0, 3.0, 5.0, 10.0),
    seeds: Sequence[int] = (980616,),
) -> List[SweepMember]:
    """The BASELINE.json frontier grid: eps x seeds."""
    return [SweepMember(float(e), int(s)) for e in epsilons for s in seeds]

"""Fused Pallas physics tick: the whole arena tick as ONE TPU kernel.

EXPERIMENTAL — measured SLOWER than the XLA path; kept as an opt-in
research artifact, not wired into Arena.step.

Hypothesis: XLA compiles the env-last tick (arena._tick_core_inner) into
~dozens of fusions whose boundaries round-trip the working set through
HBM (~35 KB touched per arena-tick for a ~1.3 KB logical state), so a
kernel that keeps the state VMEM-resident across a whole tick-skip
window (read-state + write-state only, a ~15x traffic cut) should win.

Result (one v5e chip, 2 cars, soccar, 24 ticks/call, scripts/
tpu_tick_bench.py): the fused kernel reaches 13.0M arena-ticks/s at
N=8192 (tile=256, fori_loop over ticks) vs 18.0M for the plain XLA scan
— the tick is NOT HBM-bound at these batch sizes; it is VPU-bound, and
Mosaic's straight-line codegen for the ~8.5k-primitive tick body (mask
relayouts on [P, tile] vectors, i32-stored bools, 4-op rewritten bool
selects) costs more than the HBM traffic it saves. tile=512 exceeds
VMEM; unrolling ticks instead of fori_loop explodes compile time (>10
min). The XLA tick path stays the production default.

The machinery here is still load-bearing know-how for TPU kernels that
embed arbitrary traced physics: `_Folder` constant-folds const-only
subgraphs of a jaxpr on the host and replays the live remainder inside
a Mosaic kernel with semantics-preserving rewrites (bool select_n ->
and/or masks, cast-to-bool -> !=0, bool shape ops in i32, pjit inlining),
`PackLayout` packs a 99-leaf env-last state pytree into one [rows, N]
ref per dtype with i32 bool storage, and the respawn RNG is hoisted out
of the tick (arena._tick_respawn_idx) so the kernel body is pure
elementwise/select math. Parity vs the jitted XLA tick is asserted to
1 ulp in tests/test_pallas_tick.py (interpret mode on CPU; identical
jaxpr, differences only from fma/fusion choices).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUPS = ("f32", "bool", "i32")
_GROUP_OF = {"float32": "f32", "bool": "bool", "int32": "i32"}

# Event keys in kernel output order (matching Arena.step's accumulator
# semantics: int events add across ticks, bool events OR)
EV_I32 = ("bump", "demo", "pickup")
EV_BOOL = ("demoed",)


_CALL_PRIMS = ("jit", "pjit", "closed_call")
_DEAD = object()


class _Sym:
    """Abstract marker for trace-dependent values in the plan pass."""

    __slots__ = ("aval",)

    def __init__(self, aval):
        self.aval = aval


class _Folder:
    """Two-phase constant-folding jaxpr evaluator for Mosaic kernels.

    Phase A (`plan`, host, build time): walk the inlined jaxpr with the
    real constvar values; every eqn whose inputs are all concrete is
    executed EAGERLY on the host ("fold"), so wheel tables, pad tables,
    team masks etc. never enter the kernel as symbolic shape-gymnastics
    (Mosaic rejects broadcasts/reshapes that move data into major dims,
    which is exactly what `teams[:, None, None]`-style const prep lowers
    to). Concrete values that feed MIXED eqns become numbered "slots" —
    the live constants — recorded per use site; broadcast_in_dim operands
    are pre-reshaped host-side to the dims-inserted form so the in-kernel
    broadcast only expands singleton dims (always legal).

    Phase B (`run`, inside the Pallas kernel trace): replay the same walk
    — the plan dict keyed by a shared eqn counter guarantees alignment —
    with folded eqns skipped and slot uses read from VMEM refs. Mosaic-
    unfriendly ops are rewritten with identical semantics:
      - bool select_n        ->  (pred & on_true) | (~pred & on_false)
      - cast-to-bool         ->  x != 0
      - bool shape ops       ->  i32 shape op, != 0
    """

    def __init__(self, closed):
        from jax.extend import core as jex_core
        self._Literal = jex_core.Literal
        self.closed = closed
        self.plan = {}
        self.slot_of_use = {}   # (eqn_counter, argpos) -> slot index
        self.inline = {}        # (eqn_counter, argpos) -> python/np scalar
        self.slot_vals = []     # concrete arrays (host values)
        self.k = 0

    # ------------------------------------------------------------ phase A

    def plan_pass(self, *in_avals):
        self.k = 0
        # _build may run under an outer jit/scan trace; the folds must
        # still execute eagerly (host, concrete), not as outer-trace ops
        with jax.ensure_compile_time_eval():
            outs = self._plan(self.closed.jaxpr, self.closed.consts,
                              [_Sym(a) for a in in_avals])
        assert all(isinstance(o, _Sym) for o in outs), \
            "kernel outputs must be trace-dependent"
        return self

    def _plan(self, jaxpr, consts, args):
        env = {}

        def read(v):
            return v.val if isinstance(v, self._Literal) else env[v]

        for v, c in zip(jaxpr.constvars, consts):
            env[v] = c
        for v, a in zip(jaxpr.invars, args):
            env[v] = a
        for eqn in jaxpr.eqns:
            k = self.k
            self.k += 1
            invals = [read(x) for x in eqn.invars]
            name = eqn.primitive.name
            if not any(isinstance(v, _Sym) for v in invals):
                self.plan[k] = "fold"
                if name in _CALL_PRIMS:
                    inner = eqn.params["jaxpr"]
                    outs = jax.core.eval_jaxpr(
                        inner.jaxpr, inner.consts, *invals)
                else:
                    outs = eqn.primitive.bind(*invals, **eqn.params)
                    if not eqn.primitive.multiple_results:
                        outs = [outs]
            elif name in _CALL_PRIMS:
                self.plan[k] = "recurse"
                inner = eqn.params["jaxpr"]
                outs = self._plan(inner.jaxpr, inner.consts, invals)
            else:
                self.plan[k] = "exec"
                for pos, v in enumerate(invals):
                    if isinstance(v, _Sym):
                        continue
                    if np.ndim(v) == 0:
                        # np scalar (not 0-d device array): traces as a
                        # literal; Pallas rejects captured array consts
                        self.inline[(k, pos)] = np.asarray(v)[()]
                        continue
                    val = jnp.asarray(v)
                    if name == "broadcast_in_dim" and pos == 0:
                        # dims-inserted host reshape: in-kernel broadcast
                        # then only expands size-1 dims
                        tgt = eqn.params["shape"]
                        bd = eqn.params["broadcast_dimensions"]
                        ins = [1] * len(tgt)
                        for i, d in enumerate(bd):
                            ins[d] = val.shape[i]
                        val = val.reshape(ins)
                    self.slot_of_use[(k, pos)] = len(self.slot_vals)
                    self.slot_vals.append(val)
                outs = [_Sym(ov.aval) for ov in eqn.outvars]
            for v, o in zip(eqn.outvars, outs):
                env[v] = o
        return [read(v) for v in jaxpr.outvars]

    # ------------------------------------------------------------ phase B

    def run(self, slot_tracers, *args):
        self.k = 0
        return self._run(self.closed.jaxpr, slot_tracers, list(args))

    def _run(self, jaxpr, slots, args):
        env = {}

        def read(v):
            return v.val if isinstance(v, self._Literal) else env[v]

        for v in jaxpr.constvars:
            env[v] = _DEAD
        for v, a in zip(jaxpr.invars, args):
            env[v] = a
        for eqn in jaxpr.eqns:
            k = self.k
            self.k += 1
            mode = self.plan[k]
            if mode == "fold":
                for v in eqn.outvars:
                    env[v] = _DEAD
                continue
            name = eqn.primitive.name
            if mode == "recurse":
                inner = eqn.params["jaxpr"]
                outs = self._run(inner.jaxpr, slots,
                                 [read(x) for x in eqn.invars])
            else:
                invals = []
                for pos, x in enumerate(eqn.invars):
                    if (k, pos) in self.slot_of_use:
                        invals.append(slots[self.slot_of_use[(k, pos)]])
                    elif (k, pos) in self.inline:
                        invals.append(self.inline[(k, pos)])
                    else:
                        val = read(x)
                        assert val is not _DEAD, (
                            f"unplanned const use at eqn {k} ({name})")
                        invals.append(val)
                outs = self._exec(eqn, k, name, invals)
            for v, o in zip(eqn.outvars, outs):
                env[v] = o
        return [read(v) for v in jaxpr.outvars]

    def _exec(self, eqn, k, name, invals):
        in_dt = [v.dtype if hasattr(v, "dtype") else np.asarray(v).dtype
                 for v in invals]
        params = eqn.params
        if name == "broadcast_in_dim" and (k, 0) in self.slot_of_use:
            # operand was pre-reshaped to the dims-inserted form
            params = dict(params,
                          broadcast_dimensions=tuple(
                              range(len(params["shape"]))))
        if (name == "select_n" and len(invals) == 3
                and eqn.outvars[0].aval.dtype == jnp.bool_
                and in_dt[0] == jnp.bool_):
            pred, a, b = invals
            return [(pred & b) | (~pred & a)]
        if (name == "convert_element_type"
                and params.get("new_dtype") == jnp.bool_):
            return [invals[0] != 0]
        if (name in ("broadcast_in_dim", "reshape", "squeeze",
                     "transpose", "slice", "concatenate", "rev")
                and in_dt[0] == jnp.bool_):
            outs = eqn.primitive.bind(
                *[jnp.asarray(v).astype(jnp.int32) for v in invals],
                **params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
            return [o != 0 for o in outs]
        outs = eqn.primitive.bind(*invals, **params)
        if not eqn.primitive.multiple_results:
            outs = [outs]
        return outs


class PackLayout:
    """Pack a pytree of [lead..., N] arrays into one [rows, N] per dtype.

    Row order is the pytree flatten order; each leaf occupies
    prod(lead) consecutive rows. unpack() inverts with static slices +
    sublane-splitting reshapes (both Mosaic-legal)."""

    def __init__(self, tree):
        leaves, self.treedef = jax.tree.flatten(tree)
        self.specs = []
        counts = dict.fromkeys(GROUPS, 0)
        for leaf in leaves:
            g = _GROUP_OF[str(leaf.dtype)]
            lead = tuple(leaf.shape[:-1])
            r = int(np.prod(lead, dtype=np.int64)) if lead else 1
            self.specs.append((g, counts[g], r, lead))
            counts[g] += r
        self.rows = dict(counts)

    def pack(self, tree, to_storage=False):
        """to_storage: bool leaves are cast to i32 BEFORE any shape op —
        inside Mosaic kernels, reshape/slice/concat must not see i1."""
        groups = {g: [] for g in GROUPS}
        for leaf, (g, _, r, _) in zip(jax.tree.leaves(tree), self.specs):
            if to_storage and g == "bool":
                leaf = leaf.astype(jnp.int32)
            groups[g].append(leaf.reshape(r, leaf.shape[-1]))
        return {g: jnp.concatenate(v, axis=0) if v else None
                for g, v in groups.items()}

    def unpack(self, packs, from_storage=False):
        leaves = []
        for (g, start, r, lead) in self.specs:
            a = packs[g][start:start + r]
            a = a.reshape(*lead, a.shape[-1])
            if from_storage and g == "bool":
                a = a != 0
            leaves.append(a)
        return jax.tree.unflatten(self.treedef, leaves)


def _pick_tile(n, tile=None):
    if tile is not None:
        return tile if n % tile == 0 else None
    for t in (256, 512, 128, 1024):
        if n % t == 0:
            return t
    return None


@functools.lru_cache(maxsize=32)
def _build(arena_ref, num_ticks, n, core_struct, ctrl_struct, interpret):
    """Trace the num_ticks tick loop to a jaxpr and wrap it in a
    pallas_call. Cached per (arena, T, N, input structure)."""
    arena = arena_ref()
    P = arena.num_players
    core_example = jax.tree.unflatten(*core_struct)
    ctrl_example = jax.tree.unflatten(*ctrl_struct)
    layout = PackLayout(core_example)
    ctrl_layout = PackLayout(ctrl_example)
    assert ctrl_layout.rows["i32"] == 0
    n_core = len(layout.specs)

    # ONE tick traced; the kernel runs num_ticks of them in a
    # lax.fori_loop so the compiled body is tick-count independent and
    # the state stays VMEM-resident across all ticks
    def flat_fn(ridx_t, *flat):
        core = jax.tree.unflatten(layout.treedef, flat[:n_core])
        ctrl = jax.tree.unflatten(ctrl_layout.treedef, flat[n_core:])
        core, ev = arena._tick_core_inner(core, ctrl, ridx_t)
        return (tuple(jax.tree.leaves(core))
                + tuple(ev[k].astype(jnp.int32) for k in EV_I32)
                + tuple(ev[k].astype(jnp.int32) for k in EV_BOOL))

    tile = n if interpret else _pick_tile(n)
    if tile is None:
        raise ValueError(f"pallas tick needs num_envs % 128 == 0, got {n}")

    # trace at TILE width: the kernel body sees one [.., tile] block per
    # grid step, so every static shape inside the jaxpr must be tile-wide
    def _tiled(s):
        return jax.ShapeDtypeStruct((*s.shape[:-1], tile), s.dtype)

    ridx_aval = jax.ShapeDtypeStruct((P, tile), jnp.int32)
    closed = jax.make_jaxpr(flat_fn)(
        ridx_aval, *[_tiled(s) for s in jax.tree.leaves(core_example)],
        *[_tiled(s) for s in jax.tree.leaves(ctrl_example)])
    # Constant-fold the const-only subgraphs on the host (phase A); the
    # surviving live constants are fed as small VMEM refs, canonicalized
    # to 2-D (prod(lead), last) — Mosaic rejects loads/reshapes that move
    # data into major dims, while 2-D loads + sublane-split reshapes +
    # singleton-dim broadcasts are legal
    folder = _Folder(closed).plan_pass(
        *(v.aval for v in closed.jaxpr.invars))
    slot_vals = [np.asarray(v) for v in folder.slot_vals]
    slot_2d = [(int(np.prod(v.shape[:-1], dtype=np.int64)),
                int(v.shape[-1])) for v in slot_vals]
    slot_feed = [jnp.asarray(v.astype(np.int32) if v.dtype == np.bool_
                             else v).reshape(s) for v, s in
                 zip(slot_vals, slot_2d)]
    state_groups = [g for g in GROUPS if layout.rows[g]]
    ctrl_groups = [g for g in GROUPS if ctrl_layout.rows[g]]
    RP = ((P + 7) // 8) * 8          # ridx rows per tick, 8-aligned

    # Mosaic cannot truncate loaded i8/i32 vectors to i1, so bool groups
    # are STORED as int32 (PackLayout to/from_storage does the per-leaf
    # conversion inside the kernel; feeds/outputs convert XLA-side here)
    def _store_cast(a, g):
        return a.astype(jnp.int32) if g == "bool" else a

    def kernel(*refs):
        it = iter(refs)
        spacks = {g: next(it)[:] for g in state_groups}
        cpacks = {g: next(it)[:] for g in ctrl_groups}
        ridx_ref = next(it)              # [num_ticks * P, tile]
        slots = []
        for v in slot_vals:
            # i32-stored bools: reshape in i32, compare to mask at the end
            sv = next(it)[:].reshape(v.shape)
            slots.append((sv != 0) if v.dtype == np.bool_ else sv)
        out_state = {g: next(it) for g in state_groups}
        out_ev_i32 = next(it)
        out_ev_bool = next(it)

        # controls are loop-invariant; unpack once
        ctrl_leaves = jax.tree.leaves(ctrl_layout.unpack(
            {g: cpacks.get(g) for g in GROUPS}, from_storage=True))

        def body(t, carry):
            packs, ev_i, ev_b = carry
            # rows padded to a sublane multiple per tick: the dynamic
            # start must be provably 8-aligned for Mosaic
            ridx_t = ridx_ref[pl.ds(t * RP, RP)][:P]
            core = layout.unpack({g: packs.get(g) for g in GROUPS},
                                 from_storage=True)
            outs = folder.run(slots, ridx_t,
                              *jax.tree.leaves(core), *ctrl_leaves)
            new_packs = layout.pack(
                jax.tree.unflatten(layout.treedef, list(outs[:n_core])),
                to_storage=True)
            evs = outs[n_core:]
            ev_i = ev_i + jnp.concatenate(evs[:len(EV_I32)], axis=0)
            ev_b = ev_b | jnp.concatenate(evs[len(EV_I32):], axis=0)
            return ({g: new_packs[g] for g in state_groups}, ev_i, ev_b)

        init = (spacks,
                jnp.zeros((len(EV_I32) * P, tile), jnp.int32),
                jnp.zeros((len(EV_BOOL) * P, tile), jnp.int32))
        packs, ev_i, ev_b = jax.lax.fori_loop(0, num_ticks, body, init)
        for g in state_groups:
            out_state[g][:] = packs[g]
        out_ev_i32[:] = ev_i
        out_ev_bool[:] = ev_b

    def tiled_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [tiled_spec(layout.rows[g]) for g in state_groups]
        + [tiled_spec(ctrl_layout.rows[g]) for g in ctrl_groups]
        + [tiled_spec(num_ticks * RP)]
        + [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for s in slot_2d]
    )
    out_specs = (
        [tiled_spec(layout.rows[g]) for g in state_groups]
        + [tiled_spec(len(EV_I32) * P), tiled_spec(len(EV_BOOL) * P)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((layout.rows[g], n),
                              dict(f32=jnp.float32, bool=jnp.int32,
                                   i32=jnp.int32)[g])
         for g in state_groups]
        + [jax.ShapeDtypeStruct((len(EV_I32) * P, n), jnp.int32),
           jax.ShapeDtypeStruct((len(EV_BOOL) * P, n), jnp.int32)]
    )

    call = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=bool(interpret),
    )

    def run(core, ctrl, ridx_all):
        spacks = layout.pack(core)
        cpacks = ctrl_layout.pack(ctrl)
        args = ([_store_cast(spacks[g], g) for g in state_groups]
                + [_store_cast(cpacks[g], g) for g in ctrl_groups]
                + [jnp.pad(ridx_all, ((0, 0), (0, RP - P), (0, 0))
                           ).reshape(num_ticks * RP, n)]
                + slot_feed)
        outs = call(*args)
        new_core = layout.unpack(
            {g: (o != 0) if g == "bool" else o
             for g, o in zip(state_groups, outs[:len(state_groups)])})
        ev_i32, ev_bool = outs[len(state_groups):]
        events = {k: ev_i32[i * P:(i + 1) * P]
                  for i, k in enumerate(EV_I32)}
        events.update({k: ev_bool[i * P:(i + 1) * P] != 0
                       for i, k in enumerate(EV_BOOL)})
        return new_core, events

    return run


class _ArenaRef:
    """Hashable weak identity wrapper so lru_cache can key on the arena."""

    def __init__(self, arena):
        self._arena = arena

    def __call__(self):
        return self._arena

    def __hash__(self):
        return id(self._arena)

    def __eq__(self, other):
        return isinstance(other, _ArenaRef) and other._arena is self._arena


def _struct_of(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return (treedef,
            tuple(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves))


def fused_ticks(arena, core, cctrl, ridx_all, interpret=False):
    """Run ridx_all.shape[0] physics ticks as one Pallas kernel.

    core/cctrl: env-last pytrees with a single trailing env axis N;
    ridx_all: [T, P, N] int32 respawn indices (one row per tick, from
    arena._tick_respawn_idx). Returns (core', events) with the same
    semantics as scanning arena._tick_core T times (int events summed,
    bool events OR-ed); same traced jaxpr, matching to ~1 ulp (fma /
    fusion choices differ between Mosaic and XLA)."""
    num_ticks, _, n = ridx_all.shape
    run = _build(_ArenaRef(arena), int(num_ticks), int(n),
                 _struct_of(core), _struct_of(cctrl), bool(interpret))
    return run(core, cctrl, ridx_all)

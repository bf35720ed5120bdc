"""Fused whole-rollout Pallas TPU kernel for the flagship full-game env.

This is the full-env counterpart of ``ops/fused_rollout.py`` (the sim-engine
kernel), built per docs/FUSED_FULL_ENV_DESIGN.md: the flagship Discrete(60)
environment (``engine/full_env.py``, rebuilding balatro_env_2.py:354-1888)
runs as ONE Pallas kernel per rollout — the entire env state (64-slot card
channels, hand, jokers, consumables, shop, boss, RNG streams) lives in
VMEM/vector registers across all steps, so the chip executes one fused
program instead of the ~2000 tiny HBM-bound XLA ops per step that cap the
jnp path at ~1.9M env-steps/s.

Semantics: a 1:1 mirror of ``full_env.step_autoreset`` under the f32/i32
production configuration (x64 disabled — the TPU configuration; the x64
float path exists only for reference-parity tests). Every bug-faithful
quirk of the jnp engine is preserved because the kernel reproduces the jnp
engine's arithmetic op-for-op: same truncation points, same f32 op order,
same integer dtypes. See tests/test_fused_full_rollout.py.

Two modes (static switch):

* ``actions=[n_steps, B]`` (validation): replays fed actions with the jnp
  engine's EXACT named-stream RNG — ``ops/kernel_rng`` reproduces every
  ``jax.random`` draw (fold_in chains, uniform, randint, split) bit-exactly
  as elementwise uint32 ops, so the rollout is BIT-IDENTICAL to
  ``engine/full_env.step`` on every state field until an episode's first
  autoreset (the reset deck shuffle is the one deviation — see below).
* ``actions=None`` (bench/training): actions are sampled uniformly over the
  legal action set in-kernel via the TPU hardware PRNG
  (``pltpu.prng_random_bits``) — distributionally identical to mask-legal
  random stepping of the jnp engine, not bit-identical (PARITY.md §B7
  extension).

Deck shuffle (autoreset): the jnp engine uses ``jax.random.permutation``
(sort-based, impractical in-kernel). The kernel shuffles by drawing one
random priority word per card and network-sorting the 64 (priority<<6|index)
words across VMEM rows — a uniform permutation up to 26-bit priority ties
(P ~ 2e-5 per episode, broken deterministically by index). Exact-fed
validation therefore compares envs up to their first autoreset, mirroring
tests/test_fused_rollout.py's treatment of sim-engine resets.

Numerics contract (why bit-exactness holds in f32): all persistent state is
int32 (matching the x64-off jnp engine exactly, including any eventual
overflow behavior); transient float math is f32 with the jnp engine's op
order; x-mults are integer-exponent powers of exact bases evaluated by
multiply chains that are verified equal to XLA's ``lax.pow`` on the test
backend for the reachable exponent domains (3**e<=12, 1.5**e<=20, 0.8**e<=5,
2**e); the inexact 1.15^ante / 1.5^(ante-8) cost/blind scalings use tables
minted from ``lax.pow`` on the CURRENT backend so kernel and jnp engine read
identical constants.

Env batch layout: env ``e`` of a tile maps to (sublane ``e // LANES``, lane
``e % LANES``); every per-env scalar is a full (8, LANES) vector register.
Per-card channels are 64 such rows per channel.

Reference citations live in engine/full_env.py and its helpers; this module
cites the jnp engine it mirrors (file:function) rather than re-citing
balatro_env_2.py line-by-line.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core import rng as R
from balatro_gym_tpu.core.constants import Action, HandType, Phase
from balatro_gym_tpu.engine import consumable_logic as CL
from balatro_gym_tpu.engine import shop_logic as SL
from balatro_gym_tpu.ops import boss as B
from balatro_gym_tpu.ops import joker_tables as JT
from balatro_gym_tpu.ops import kernel_rng as KR

SUB = 8
LANES = 128
TILE = SUB * LANES

N_DECK = 64
N_HAND = 8   # hand positions. The jnp state carries 10, but hand_size
#              starts at 8 and only ever decreases (full_env._select_blind
#              Manacle -1; consumables -1), so positions 8-9 are never
#              occupied; rows 8-9 pack/unpack as constant -1.
N_JOK = 5
N_CONS = 5
N_SHOP = 10
N_LVL = 12
N_CTR = 16

i32, u32, f32 = jnp.int32, jnp.uint32, jnp.float32
# i64 under x64, i32 in production (no dtype-request warnings under f32).
_i64 = jax.dtypes.canonicalize_dtype(jnp.int64)

# ---------------------------------------------------------------------------
# Packed-state row maps (host <-> kernel)
# ---------------------------------------------------------------------------

# cards pack [6, 64, B] channel order:
CH_RANK, CH_SUIT, CH_ENH, CH_ED, CH_SEAL, CH_ALIVE = range(6)

# ints pack [NI, B] rows:
R_HIDX = 0              # 10 rows (hand_idx; rows 8-9 always -1)
R_SEL = 10              # 8
R_FD = 18               # 8
R_JOK = 26              # 5
R_CONS = 31             # 5
R_STY = 36              # 10
R_SIT = 46              # 10
R_SCO = 56              # 10
R_LVL = 66              # 12
R_PC = 78               # 12
S_HN, S_JN, S_GREEN, S_BUS, S_CN, S_VOU, S_JSLOTS, S_CSLOTS = range(90, 98)
S_ANTE, S_ROUND, S_PHASE, S_NEED, S_CAREER, S_RCHIPS, S_BEST = range(98, 105)
S_MONEY, S_HL, S_DL, S_HSIZE, S_SN, S_RBASE, S_RCOST = range(105, 112)
S_BACT, S_BID, S_BTYPES, S_BFIRST, S_BVERD, S_BPLO, S_BPHI = range(112, 119)
S_HPT, S_HPA, S_JSOLD, S_DONE, S_STEPC = range(119, 124)
R_HIGH = 124            # 8 rows: game.highlighted_indexes mask (#A39/#A40)
NI = 132

# rng pack [18, B] u32 rows: 0 = key hi word, 1 = key lo word, 2.. counters.
NR = 2 + N_CTR

_F32_STATE_FIELDS = ()  # all persistent state is int32 (x64-off semantics)

# Static tables as python constants (trace-time unrolled).
_BASE_CHIPS = [5, 10, 20, 30, 30, 35, 40, 60, 100, 120, 140, 160]
_BASE_MULT = [1, 2, 2, 3, 4, 4, 4, 7, 8, 12, 14, 16]
_RANK_CHIPS = [int(x) for x in np.asarray(C.RANK_CHIPS)]          # [15]
_ENH_CHIPS = [int(x) for x in np.asarray(C.ENH_CHIPS)]            # [9]
_ED_CHIPS = [int(x) for x in np.asarray(C.ED_CHIPS)]              # [5]
from balatro_gym_tpu.core import constants as _CONST  # noqa: E402

_BLIND_TABLE = [[int(x) for x in row] for row in _CONST._blind_chips]
_HAND_QUALITY = None  # filled below (import order)
_PLANET_OBS = None
_PACK_COSTS = [int(x) for x in np.asarray(SL.PACK_COSTS)]         # [5]
_VOUCHER_COSTS = [int(x) for x in np.asarray(SL.VOUCHER_COSTS)]   # [2]
_JCOST = [int(x) for x in JT.JOKER_BASE_COST_NP]                  # [151]
_ELIGIBLE = [bool(x) for x in (JT.JOKER_BASE_COST_NP > 0)]        # [151]
_ENH_TAROT = [int(x) for x in np.asarray(CL.ENH_TAROT)]           # [23]
_ENH_COUNT = [int(x) for x in np.asarray(CL.ENH_COUNT)]
_SEAL_SPEC = [int(x) for x in np.asarray(CL.SEAL_SPEC)]           # [68]
_WRAITH = [int(x) for x in np.asarray(CL.WRAITH_JOKERS)]          # [14]
_SOUL = [int(x) for x in np.asarray(CL.SOUL_JOKERS)]              # [5]
_EDITIONS3 = [int(x) for x in np.asarray(CL.EDITIONS3)]           # [3]
_ENH_POOL7 = [int(x) for x in np.asarray(CL.ENH_POOL7)]           # [7]
_PLANET_HAND = None

from balatro_gym_tpu.core.constants import (  # noqa: E402
    PLANET_HAND as _PH_J,
)
from balatro_gym_tpu.engine.full_env import (  # noqa: E402
    HAND_QUALITY as _HQ_J,
    PLANET_OBS_OF_HAND as _PO_J,
)

_HAND_QUALITY = [float(x) for x in np.asarray(_HQ_J)]
_PLANET_OBS = [int(x) for x in np.asarray(_PO_J)]
_PLANET_HAND = [int(x) for x in np.asarray(_PH_J)]

# Joker ids the step references (count vectors computed once per step).
# NO scoring jokers here: the env scoring path applies ZERO joker effects
# (PARITY #A38 — the UnifiedScorer loops' isinstance(joker_name, str) guard
# never passes because to_dict() supplies dicts, balatro_env_2.py:219 /
# unified_scoring.py:164-221); only reward-synergy and discard-money jokers
# remain observable (balatro_env_2.py:853-863, 1006-1007,
# complete_joker_effects.py:186-208).
_CNT_IDS = sorted({JT.J_FOUR_FINGERS, JT.J_SHORTCUT, JT.J_TRADING_CARD,
                   JT.J_FACELESS, 130, 82, JT.J_LUCHADOR, 113, 42,
                   JT.J_ODD_TODD, JT.J_EVEN_STEVEN, JT.J_JOLLY, JT.J_ZANY,
                   JT.J_SCARY_FACE, JT.J_SMILEY_FACE})

_STREAM = R.STREAM_ID


from balatro_gym_tpu.core import pow_tables as PWT  # noqa: E402

_P15_F32 = PWT.f32_list(PWT.POW15_NP)     # [96]
_P08_F32 = PWT.f32_list(PWT.POW08_NP)     # [12]


def _pow_tables():
    """f32 constants from the numpy-f64 master tables (core/pow_tables.py):
    identical to the jnp engine's table dots on EVERY backend — runtime
    ``lax.pow`` is approximate on TPU and was the r2 kernel's divergence."""
    a115 = PWT.f32_list(PWT.POW115_NP)    # [100]
    a15 = list(_P15_F32)                  # [96]
    return a115, a15


def _pow_select(e_i32, table_f32):
    """table[clip(e, 0, len-1)] as an equality-select ladder (trace-time
    constants; matches core/pow_tables._gather exactly)."""
    e = jnp.clip(e_i32, 0, len(table_f32) - 1)
    out = jnp.zeros((SUB, LANES), f32)
    for k, v in enumerate(table_f32):
        out = jnp.where(e == k, jnp.float32(v), out)
    return out


# ---------------------------------------------------------------------------
# Host-side pack / unpack
# ---------------------------------------------------------------------------


def pack_full_state(st):
    """FullEnvState (batched [B]) -> dict(cards [6,64,B] i32, ints [NI,B]
    i32, rng [18,B] u32). int64 fields narrow to int32 (the kernel's —
    and the x64-off engine's — native width)."""
    B_ = st.ante.shape[0]

    cards = jnp.stack([
        st.card_rank.T.astype(i32), st.card_suit.T.astype(i32),
        st.card_enh.T.astype(i32), st.card_ed.T.astype(i32),
        st.card_seal.T.astype(i32), st.card_alive.T.astype(i32),
    ])

    ints = jnp.zeros((NI, B_), i32)

    def put(rows, val):
        return ints.at[rows].set(jnp.asarray(val, i32))

    ints = put(slice(R_HIDX, R_HIDX + 10), st.hand_idx.T)
    ints = put(slice(R_SEL, R_SEL + 8), st.selected.T)
    ints = put(slice(R_FD, R_FD + 8), st.face_down.T)
    ints = put(slice(R_JOK, R_JOK + 5), st.jokers.T)
    ints = put(slice(R_CONS, R_CONS + 5), st.cons.T)
    ints = put(slice(R_STY, R_STY + 10), st.shop_type.T)
    ints = put(slice(R_SIT, R_SIT + 10), st.shop_item.T)
    ints = put(slice(R_SCO, R_SCO + 10), st.shop_cost.T)
    ints = put(slice(R_LVL, R_LVL + 12), st.hand_levels.T)
    ints = put(slice(R_PC, R_PC + 12), st.hand_play_counts.T)
    ints = put(slice(R_HIGH, R_HIGH + 8), st.highlighted.T)

    bits = jnp.asarray(1, u32) << jnp.arange(32, dtype=u32)
    bp = st.boss_played_slots.astype(u32)
    # dtype pinned: under x64 jnp.sum would promote u32 -> u64 and the
    # bitcast below would grow a trailing dim (tests pack x64-on states).
    bp_lo = jnp.sum(bp[:, :32] * bits, axis=1, dtype=u32)
    bp_hi = jnp.sum(bp[:, 32:] * bits, axis=1, dtype=u32)

    for row, val in [
        (S_HN, st.hand_n), (S_JN, st.joker_n), (S_GREEN, st.green_mult),
        (S_BUS, st.bus_mult), (S_CN, st.cons_n),
        (S_VOU, st.vouchers.astype(u32).astype(i32)),
        (S_JSLOTS, st.joker_slots), (S_CSLOTS, st.cons_slots),
        (S_ANTE, st.ante), (S_ROUND, st.round), (S_PHASE, st.phase),
        (S_NEED, st.chips_needed), (S_CAREER, st.chips_scored),
        (S_RCHIPS, st.round_chips_scored), (S_BEST, st.best_hand_this_ante),
        (S_MONEY, st.money), (S_HL, st.hands_left), (S_DL, st.discards_left),
        (S_HSIZE, st.hand_size), (S_SN, st.shop_n), (S_RBASE, st.reroll_base),
        (S_RCOST, st.shop_reroll_cost), (S_BACT, st.boss_active),
        (S_BID, st.boss_id),
        (S_BTYPES, st.boss_played_types.astype(u32).astype(i32)),
        (S_BFIRST, st.boss_first_hand), (S_BVERD, st.boss_verdant_req),
        (S_BPLO, jax.lax.bitcast_convert_type(bp_lo, i32)),
        (S_BPHI, jax.lax.bitcast_convert_type(bp_hi, i32)),
        (S_HPT, st.hands_played_total), (S_HPA, st.hands_played_ante),
        (S_JSOLD, st.jokers_sold), (S_DONE, st.done), (S_STEPC, st.step_count),
    ]:
        ints = ints.at[row].set(jnp.asarray(val).astype(i32))

    kd = jax.vmap(jax.random.key_data)(st.key).astype(u32)  # [B, 2]
    rng = jnp.concatenate([kd.T, st.rng_counters.T.astype(u32)])
    return {"cards": cards, "ints": ints, "rng": rng}


def unpack_full_state(packed, key_ref=None):
    """Inverse of :func:`pack_full_state` -> FullEnvState (batched).

    ``key_ref``: optional key array to adopt (keys survive packing exactly,
    but wrap_key_data needs the impl; default threefry)."""
    from balatro_gym_tpu.engine.full_env import FullEnvState

    cards, ints, rng = packed["cards"], packed["ints"], packed["rng"]

    def rows(base, n):
        return ints[base:base + n].T

    bits = jnp.arange(32, dtype=u32)
    bp_lo = jax.lax.bitcast_convert_type(ints[S_BPLO], u32)
    bp_hi = jax.lax.bitcast_convert_type(ints[S_BPHI], u32)
    bp = jnp.concatenate([
        ((bp_lo[:, None] >> bits) & 1).astype(bool),
        ((bp_hi[:, None] >> bits) & 1).astype(bool)], axis=1)

    key = jax.vmap(jax.random.wrap_key_data)(rng[:2].T)
    return FullEnvState(
        card_rank=cards[CH_RANK].T, card_suit=cards[CH_SUIT].T,
        card_enh=cards[CH_ENH].T, card_ed=cards[CH_ED].T,
        card_seal=cards[CH_SEAL].T, card_alive=cards[CH_ALIVE].T.astype(bool),
        hand_idx=rows(R_HIDX, 10), hand_n=ints[S_HN],
        selected=rows(R_SEL, 8).astype(bool), face_down=rows(R_FD, 8).astype(bool),
        highlighted=rows(R_HIGH, 8).astype(bool),
        jokers=rows(R_JOK, 5), joker_n=ints[S_JN],
        green_mult=ints[S_GREEN], bus_mult=ints[S_BUS],
        cons=rows(R_CONS, 5), cons_n=ints[S_CN],
        vouchers=ints[S_VOU].astype(u32),
        joker_slots=ints[S_JSLOTS], cons_slots=ints[S_CSLOTS],
        ante=ints[S_ANTE], round=ints[S_ROUND], phase=ints[S_PHASE],
        chips_needed=ints[S_NEED].astype(_i64),
        chips_scored=ints[S_CAREER].astype(_i64),
        round_chips_scored=ints[S_RCHIPS].astype(_i64),
        money=ints[S_MONEY], hands_left=ints[S_HL], discards_left=ints[S_DL],
        hand_size=ints[S_HSIZE],
        hand_levels=rows(R_LVL, 12), hand_play_counts=rows(R_PC, 12),
        shop_type=rows(R_STY, 10), shop_item=rows(R_SIT, 10),
        shop_cost=rows(R_SCO, 10), shop_n=ints[S_SN],
        reroll_base=ints[S_RBASE], shop_reroll_cost=ints[S_RCOST],
        boss_active=ints[S_BACT].astype(bool), boss_id=ints[S_BID],
        boss_played_types=ints[S_BTYPES].astype(u32),
        boss_first_hand=ints[S_BFIRST].astype(bool),
        boss_verdant_req=ints[S_BVERD],
        boss_played_slots=bp,
        hands_played_total=ints[S_HPT], hands_played_ante=ints[S_HPA],
        best_hand_this_ante=ints[S_BEST].astype(_i64),
        jokers_sold=ints[S_JSOLD],
        key=key, rng_counters=rng[2:].T,
        done=ints[S_DONE].astype(bool), step_count=ints[S_STEPC],
    )


# ---------------------------------------------------------------------------
# In-kernel primitives
# ---------------------------------------------------------------------------


def _bitcast(x, dt):
    """Same-width bit reinterpretation. ``lax.bitcast_convert_type`` has a
    Mosaic lowering rule for equal bitwidths, so the SAME op serves both the
    Pallas kernel and the plain-XLA rows harness (``rollout_full_rows``) —
    no mode global (round-2 advisor finding)."""
    return jax.lax.bitcast_convert_type(x, dt)


def _bits_hw(shape=None):
    shape = shape or (SUB, LANES)
    return _bitcast(pltpu.prng_random_bits(shape), u32)


def _u32_to_f32(u):
    return _bitcast(u, i32).astype(f32)


_SORT_FLIP = -(2 ** 31)  # i32 sign-bit flip


def _sortable(u):
    """u32 -> i32 preserving unsigned order (sign-bit flip). Mosaic has no
    unsigned max/min/compare lowerings (arith.maxui fails to legalize), so
    every ORDERING of random u32 priority words happens in this signed
    domain: flip(0)=INT32_MIN, flip(0xFFFFFFFF)=INT32_MAX, and the low 6
    bits of packed (priority|index) words are unchanged."""
    return _bitcast(u, i32) ^ jnp.int32(_SORT_FLIP)


def _u01_hw(bits):
    return _u32_to_f32(bits >> jnp.uint32(8)) * jnp.float32(2.0 ** -24)


def _sel(p, a, b):
    """Predicated select that is Mosaic-safe for bool operands (a select
    BETWEEN bool vectors cannot lower; use bitwise logic)."""
    a = jnp.asarray(a)
    if a.dtype == jnp.bool_:
        return (p & a) | (~p & jnp.asarray(b))
    return jnp.where(p, a, b)


def _msel(p, upd: dict, base: dict) -> dict:
    """Merge: fields in `upd` replace `base` where p (lists elementwise)."""
    out = dict(base)
    for k, v in upd.items():
        bv = base[k]
        if isinstance(v, (list, tuple)):
            out[k] = [_sel(p, x, y) for x, y in zip(v, bv)]
        else:
            out[k] = _sel(p, v, bv)
    return out


def _trunc(x):
    return jnp.floor(x)  # all truncation sites are non-negative


class _Rng:
    """Draw adapter: exact named-stream threefry (bit-identical to the jnp
    engine's jax.random use) or TPU hardware PRNG (sampling mode)."""

    def __init__(self, exact: bool):
        self.exact = exact

    def stream(self, s, name):
        """Next draw key for stream `name`; returns (key, new_ctr_list).
        Mirrors core/rng.next_key: fold_in(fold_in(master, sid), counter)."""
        sid = _STREAM[name]
        if self.exact:
            sk = KR.fold_in(s["k1"], s["k2"], jnp.full((SUB, LANES), sid, u32))
            key = KR.fold_in(sk[0], sk[1], s["ctr"][sid])
        else:
            key = None
        ctr = list(s["ctr"])
        ctr[sid] = ctr[sid] + jnp.uint32(1)
        return key, ctr

    def fold(self, key, data):
        if self.exact:
            return KR.fold_in(key[0], key[1], jnp.full((SUB, LANES), data, u32)
                              if np.isscalar(data) else data.astype(u32))
        return None

    def child(self, key, idx):
        if self.exact:
            return KR.split_child(key[0], key[1], jnp.full((SUB, LANES), idx, u32))
        return None

    def bits(self, key, idx=0):
        if self.exact:
            return KR.random_bits32(key[0], key[1],
                                    jnp.full((SUB, LANES), idx, u32))
        return _bits_hw()

    def uniform(self, key, idx=0):
        if self.exact:
            return KR.uniform_f32(self.bits(key, idx))
        return _u01_hw(_bits_hw())

    def randint(self, key, lo, hi, idx=0):
        if self.exact:
            return KR.randint(key[0], key[1], lo, hi,
                              jnp.full((SUB, LANES), idx, u32))
        # span guard in i32 (no unsigned max in Mosaic); bounds are small.
        # Broadcast before the bitcast — tpu.bitcast requires vectors.
        span = jnp.broadcast_to(
            jnp.maximum(jnp.asarray(hi, i32) - jnp.asarray(lo, i32), 1),
            (SUB, LANES))
        return (jnp.asarray(lo, i32)
                + _bitcast(_bits_hw() % _bitcast(span, u32), i32))


# ---------------------------------------------------------------------------
# Hand plumbing (mirrors full_env._draw_cards/_remove_hand_positions with
# materialized per-position hand channels)
# ---------------------------------------------------------------------------


def _inhand_rows(s):
    """Expand the in-hand bitset to 64 per-slot bools."""
    lo, hi = s["ih_lo"], s["ih_hi"]
    # != 0 not > 0: unsigned compares have no Mosaic lowering
    return [(((lo if d < 32 else hi) >> jnp.uint32(d % 32)) & 1) != 0
            for d in range(N_DECK)]


def _slot_bits(hidx, gate):
    """(lo, hi) u32 bitset of hand slots `hidx` (list of i32 rows) gated by
    per-position bools."""
    lo = jnp.zeros((SUB, LANES), u32)
    hi = jnp.zeros((SUB, LANES), u32)
    for p in range(len(hidx)):
        hp = hidx[p]
        ok = gate[p] & (hp >= 0)
        sh = jnp.clip(hp, 0, 63).astype(u32)
        bit_lo = jnp.where(ok & (hp < 32),
                           jnp.uint32(1) << (sh & jnp.uint32(31)), jnp.uint32(0))
        bit_hi = jnp.where(ok & (hp >= 32),
                           jnp.uint32(1) << (sh & jnp.uint32(31)), jnp.uint32(0))
        lo = lo | bit_lo
        hi = hi | bit_hi
    return lo, hi


_HCH = ("hrk", "hsu", "hen", "hed", "hsl")
_DCH = {"hrk": "rk", "hsu": "su", "hen": "en", "hed": "edt", "hsl": "slc"}


def _remove_positions(s, rem):
    """list.remove-style stable compaction of hand positions (mirror of
    full_env._remove_hand_positions), updating materialized channels and the
    in-hand bitset. `rem`: list of 8 bools. Returns update dict."""
    keep = [ (jnp.full((SUB, LANES), p, i32) < s["hn"]) & ~rem[p]
             for p in range(N_HAND)]
    # destination of kept position p = (#kept before or at p) - 1
    cum = []
    acc = jnp.zeros((SUB, LANES), i32)
    for p in range(N_HAND):
        acc = acc + keep[p].astype(i32)
        cum.append(acc)
    new_hn = acc

    # Packed compaction (same word layout as _draw_pass): one
    # compare+select per (src, dst) pair instead of six.
    pk = [s["hrk"][p] | (s["hsu"][p] << 4) | (s["hen"][p] << 8)
          | (s["hed"][p] << 12) | (s["hsl"][p] << 16)
          | (jnp.maximum(s["hidx"][p], 0) << 20)
          for p in range(N_HAND)]
    upd = {}
    new_hidx = []
    new_ch = {k: [] for k in _HCH}
    neg1 = jnp.full((SUB, LANES), -1, i32)
    # Route precompute (see _draw_pass): one compare+select per (src, dst)
    # pair instead of sub+compare+and+select.
    route = [jnp.where(keep[p], cum[p] - 1, neg1) for p in range(N_HAND)]
    for q in range(N_HAND):
        acc = neg1
        for p in range(q, N_HAND):
            acc = jnp.where(route[p] == q, pk[p], acc)
        got = acc >= 0
        new_hidx.append(jnp.where(got, acc >> 20, -1))
        new_ch["hrk"].append(jnp.where(got, acc & 15, 0))
        new_ch["hsu"].append(jnp.where(got, (acc >> 4) & 15, 0))
        new_ch["hen"].append(jnp.where(got, (acc >> 8) & 15, 0))
        new_ch["hed"].append(jnp.where(got, (acc >> 12) & 15, 0))
        new_ch["hsl"].append(jnp.where(got, (acc >> 16) & 15, 0))
    upd["hidx"] = new_hidx
    upd.update(new_ch)
    upd["hn"] = new_hn
    # clear removed slots from the in-hand bitset
    gate = [rem[p] & (jnp.full((SUB, LANES), p, i32) < s["hn"])
            for p in range(N_HAND)]
    blo, bhi = _slot_bits(s["hidx"], gate)
    upd["ih_lo"] = s["ih_lo"] & ~blo
    upd["ih_hi"] = s["ih_hi"] & ~bhi
    return upd


def _draw_pass(s, do):
    """Top up the hand with the lowest available deck slots (mirror of
    full_env._draw_cards), gated by `do`. Returns update dict."""
    need = jnp.clip(s["hsize"] - s["hn"], 0, N_HAND) * do.astype(i32)
    ih = _inhand_rows(s)
    cum = jnp.zeros((SUB, LANES), i32)
    chosen = []
    pos = []
    for d in range(N_DECK):
        avail = s["al"][d] & ~ih[d]
        cum = cum + avail.astype(i32)
        ch = avail & (cum <= need)
        chosen.append(ch)
        pos.append(s["hn"] + cum - 1)
    n_drawn = jnp.zeros((SUB, LANES), i32)
    for d in range(N_DECK):
        n_drawn = n_drawn + chosen[d].astype(i32)

    # Packed gather: one i32 word carries all five card channels + the slot
    # index (rk 0-3 | su 4-7 | en 8-11 | ed 12-15 | sl 16-19 | d 20-25), so
    # the 64x8 (slot, position) grid costs one compare+select per pair
    # instead of six (values all fit: rk<=14, su<=3, en<=8, ed<=4, sl<=4).
    pk = [s["rk"][d] | (s["su"][d] << 4) | (s["en"][d] << 8)
          | (s["edt"][d] << 12) | (s["slc"][d] << 16) | (d << 20)
          for d in range(N_DECK)]
    new_hidx = list(s["hidx"])
    new_ch = {k: list(s[k]) for k in _HCH}
    neg1 = jnp.full((SUB, LANES), -1, i32)
    # Route precompute: fold `chosen` into the destination once so the 64x8
    # grid pays one compare+select per pair instead of compare+and+select
    # (route is -1 when not chosen, and p ranges over [0, 8) only).
    route = [jnp.where(chosen[d], pos[d], neg1) for d in range(N_DECK)]
    for p in range(N_HAND):
        acc = neg1
        for d in range(N_DECK):
            acc = jnp.where(route[d] == p, pk[d], acc)
        drawn = acc >= 0
        new_hidx[p] = jnp.where(drawn, acc >> 20, new_hidx[p])
        new_ch["hrk"][p] = jnp.where(drawn, acc & 15, new_ch["hrk"][p])
        new_ch["hsu"][p] = jnp.where(drawn, (acc >> 4) & 15, new_ch["hsu"][p])
        new_ch["hen"][p] = jnp.where(drawn, (acc >> 8) & 15, new_ch["hen"][p])
        new_ch["hed"][p] = jnp.where(drawn, (acc >> 12) & 15, new_ch["hed"][p])
        new_ch["hsl"][p] = jnp.where(drawn, (acc >> 16) & 15, new_ch["hsl"][p])
    lo = s["ih_lo"]
    hi = s["ih_hi"]
    for d in range(N_DECK):
        if d < 32:
            lo = lo | jnp.where(chosen[d], jnp.uint32(1 << d), jnp.uint32(0))
        else:
            hi = hi | jnp.where(chosen[d], jnp.uint32(1 << (d - 32)), jnp.uint32(0))
    upd = {"hidx": new_hidx, "hn": s["hn"] + n_drawn, "ih_lo": lo, "ih_hi": hi}
    upd.update(new_ch)
    return upd


def _hand_to_deck(s, mask8):
    """[64] per-slot bools for a hand-position mask (for deck-channel
    writes). Routed through a u32 bitset: 8 set-bit ops + 64 test-bit ops
    instead of the naive 64x8 compare/OR grid (~2.5x fewer vector ops;
    three instantiations per step)."""
    lo, hi = _slot_bits(s["hidx"], mask8)
    return [((((lo if d < 32 else hi) >> jnp.uint32(d % 32)) & 1) != 0)
            for d in range(N_DECK)]


def _first_k_selected(sel, k):
    """Mask of the first k True positions (consumable_logic semantics)."""
    cum = jnp.zeros((SUB, LANES), i32)
    out = []
    for p in range(N_HAND):
        cum = cum + sel[p].astype(i32)
        out.append(sel[p] & (cum <= k))
    return out


# ---------------------------------------------------------------------------
# Scoring (mirror of ops/scoring.score_env_unified + hand_eval.classify_env)
# ---------------------------------------------------------------------------


def _score_play(s, rng, view, k_score):
    """score_env_unified + the _play_hand scoring cascade. Returns a dict of
    intermediates used by the play branch. ``k_score`` is accepted but
    unused: no joker effect fires in this path (PARITY #A38), so the
    'joker_effects' stream key is drawn (counters advance, mirroring the
    engine) but never consumed."""
    del k_score
    ranks, suits, enh, ed, seal, present = view
    sel = [s["sel"][p] & present[p] for p in range(N_HAND)]
    zero = jnp.zeros((SUB, LANES), i32)

    n_played = zero
    for p in range(N_HAND):
        n_played = n_played + sel[p].astype(i32)

    # ---- classification (#A39/#A40): the env classifies
    # [game.deck[i] for i in game.highlighted_indexes] — DECK slots 0..7 of
    # the union of every selection played since the last discard, NOT the
    # hand's cards (balatro_env_2.py:663-671, balatro_game.py:30-33).
    uni = [s["high"][p] | sel[p] for p in range(N_HAND)]
    crk = [s["rk"][p] for p in range(N_HAND)]
    csu = [s["su"][p] for p in range(N_HAND)]
    n_union = zero
    for p in range(N_HAND):
        n_union = n_union + uni[p].astype(i32)
    # Rank histogram via dynamic-shift bitpack: 4-bit count fields (counts
    # <= 8), ranks 2-9 in w_lo, 10-14 in w_hi — 8 shifted adds + 13 decodes
    # instead of the 13x8 compare grid. crk is always in [2, 14]: deck
    # slots 0-7 hold real cards from reset on and destruction never zeroes
    # the rank channel.
    w_lo = jnp.zeros((SUB, LANES), u32)
    w_hi = jnp.zeros((SUB, LANES), u32)
    one = jnp.uint32(1)
    for p in range(N_HAND):
        sh = _bitcast((crk[p] - 2) << 2, u32)  # 4*(rank-2) in [0, 48]
        v = jnp.where(uni[p], one, jnp.uint32(0))
        lo = sh < 32
        w_lo = w_lo + jnp.where(lo, v << (sh & jnp.uint32(31)), jnp.uint32(0))
        w_hi = w_hi + jnp.where(lo, jnp.uint32(0),
                                v << ((sh - 32) & jnp.uint32(31)))
    rc = []
    for r in range(2, 15):
        sh4 = 4 * (r - 2)
        w = w_lo if sh4 < 32 else w_hi
        rc.append(_bitcast((w >> jnp.uint32(sh4 % 32)) & jnp.uint32(15), i32))
    max_c = zero
    for x in rc:
        max_c = jnp.maximum(max_c, x)
    seen = jnp.zeros((SUB, LANES), bool)
    max2 = zero
    for x in rc:
        is_first = (x == max_c) & ~seen
        seen = seen | is_first
        max2 = jnp.maximum(max2, jnp.where(is_first, 0, x))
    # Suit histogram, same bitpack trick: 4 suits x 4-bit fields, one word.
    w_su = jnp.zeros((SUB, LANES), u32)
    for p in range(N_HAND):
        shs = _bitcast(csu[p] << 2, u32) & jnp.uint32(31)
        w_su = w_su + jnp.where(uni[p], one << shs, jnp.uint32(0))
    sc = [_bitcast((w_su >> jnp.uint32(4 * su)) & jnp.uint32(15), i32)
          for su in range(4)]
    n_suits = ((sc[0] > 0).astype(i32) + (sc[1] > 0).astype(i32)
               + (sc[2] > 0).astype(i32) + (sc[3] > 0).astype(i32))
    is_flush = (n_suits == 1) & (n_union >= 5)
    present_r = [x > 0 for x in rc]
    n_distinct = zero
    for x in present_r:
        n_distinct = n_distinct + x.astype(i32)
    any_win = jnp.zeros((SUB, LANES), bool)
    for r0 in range(0, 9):  # windows starting at rank 2..10
        w = present_r[r0]
        for k in range(1, 5):
            w = w & present_r[r0 + k]
        any_win = any_win | w
    ace_low = (present_r[12] & present_r[0] & present_r[1]
               & present_r[2] & present_r[3])
    is_straight = (n_distinct >= 5) & (any_win | ace_low)

    HT = HandType
    ht = jnp.full((SUB, LANES), int(HT.HIGH_CARD), i32)
    ht = jnp.where(max_c == 2, int(HT.ONE_PAIR), ht)
    ht = jnp.where((max_c == 2) & (max2 == 2), int(HT.TWO_PAIR), ht)
    ht = jnp.where(max_c == 3, int(HT.THREE_KIND), ht)
    ht = jnp.where(is_straight & (n_union >= 5), int(HT.STRAIGHT), ht)
    ht = jnp.where(is_flush & (n_union >= 5), int(HT.FLUSH), ht)
    ht = jnp.where((max_c == 3) & (max2 == 2), int(HT.FULL_HOUSE), ht)
    ht = jnp.where(max_c == 4, int(HT.FOUR_KIND), ht)
    ht = jnp.where(is_straight & is_flush & (n_union >= 5),
                   int(HT.STRAIGHT_FLUSH), ht)

    ht_is = [(ht == h) for h in range(12)]

    # ---- base chips/mult + level ----
    level = zero
    for h in range(12):
        level = level + jnp.where(ht_is[h], s["lvl"][h], 0)
    # Engine-side clamp at 15 (scoring_engine.py:84); the carried lvl rows
    # stay unclamped like state.hand_levels — full_env #A41 mirror.
    level = jnp.minimum(level, 15)
    chips = zero
    mult = zero
    for h in range(12):
        chips = chips + jnp.where(ht_is[h], _BASE_CHIPS[h], 0)
        mult = mult + jnp.where(ht_is[h], _BASE_MULT[h], 0)
    chips = chips + (level - 1) * 10
    mult = mult + (level - 1)

    # chip_value(): rank + enhancement + edition chips of ALL selected cards
    for p in range(N_HAND):
        rv = jnp.minimum(ranks[p], 10) + (ranks[p] == 14).astype(i32)
        ev = zero
        for e, v in ((C.Enhancement.BONUS, 30), (C.Enhancement.STONE, 50)):
            ev = ev + jnp.where(enh[p] == int(e), v, 0)
        dv = jnp.where(ed[p] == int(C.Edition.FOIL), 50, 0)
        chips = chips + jnp.where(sel[p], rv + ev + dv, 0)

    # ---- NO joker pass (PARITY #A38) ----
    # UnifiedScorer's joker loops never fire in the env path (the
    # isinstance(joker_name, str) guard fails on to_dict()'s dict entries,
    # unified_scoring.py:164-221 / balatro_env_2.py:219). Joker count
    # vectors are still needed for reward synergy + discard money.
    cnt = {}
    for j in _CNT_IDS:
        acc = zero
        for sl_ in range(N_JOK):
            acc = acc + (s["jok"][sl_] == j).astype(i32)
        cnt[j] = acc.astype(f32)

    # final = int(chips * mult) — x_mult stays 1 (unified_scoring.py:288-290)
    base_score = _trunc(chips.astype(f32) * mult.astype(f32)).astype(i32)

    return {"sel": sel, "n_played": n_played, "ht": ht, "ht_is": ht_is,
            "level": level, "base_score": base_score, "cnt": cnt,
            "ranks": ranks, "seal": seal, "enh": enh, "high": uni}


# ---------------------------------------------------------------------------
# Shop generation (mirror of shop_logic.generate_inventory)
# ---------------------------------------------------------------------------


def _cost_mult(s, ante, pow115):
    m = jnp.zeros((SUB, LANES), f32)
    for k in range(100):
        m = jnp.where(ante - 1 == k, pow115[k], m)
    magic = ((_bitcast(s["vou"], u32) >> jnp.uint32(SL.V_MAGIC_TRICK)) & 1) == 1
    return m * jnp.where(magic, 0.9, 1.0)


def _shop_gen(s, rng, key, ante, pow115):
    """generate_inventory as row ops. Returns (types, items, costs, n)."""
    zero = jnp.zeros((SUB, LANES), i32)
    mult = _cost_mult(s, ante, pow115)
    k_pack = rng.child(key, 0)
    k_jok = rng.child(key, 1)
    k_vouch = rng.child(key, 2)
    k_cards = rng.child(key, 3)

    third = rng.randint(k_pack, SL.PACK_TAROT, SL.PACK_SPECTRAL + 1)
    third_cost = zero
    for kind in (SL.PACK_TAROT, SL.PACK_PLANET, SL.PACK_SPECTRAL):
        third_cost = jnp.where(third == kind, _PACK_COSTS[kind], third_cost)

    # 3 distinct unowned jokers: ONE top-3 min/max insertion cascade over
    # PACKED priority words — key20 | base_cost4 | (255-id) low byte,
    # mirroring shop_logic.generate_inventory's packed ordering bit-for-bit
    # (see its docstring for the tie/uniformity analysis). The unique id
    # payload makes every word distinct, so a 5-op-per-joker sorted-triple
    # insertion (2 max/min per kept rank) replaces the three
    # argmax+knockout passes AND the per-pass id/cost trackers — the ids
    # and costs decode from the winners' low 12 bits (~2.4k -> ~1.6k
    # vector ops for this stage).
    if rng.exact:
        jkeys = [KR.random_bits32(k_jok[0], k_jok[1],
                                  jnp.full((SUB, LANES), j, u32))
                 for j in range(JT.NUM_JOKERS)]
    else:
        jb = _bitcast(pltpu.prng_random_bits((JT.NUM_JOKERS, SUB, LANES)), u32)
        jkeys = [jb[j] for j in range(JT.NUM_JOKERS)]
    disabled = jnp.full((SUB, LANES), _SORT_FLIP, i32)
    # Owned-id bitset (151 ids in 5 u32 words): 5 slot-insert ops + one
    # test-bit per joker id, instead of the 151x5 compare/OR grid.
    own = [jnp.zeros((SUB, LANES), u32) for _ in range(5)]
    for sl_ in range(N_JOK):
        jid = s["jok"][sl_]
        w = jid >> 5
        bit = jnp.uint32(1) << (_bitcast(jid, u32) & jnp.uint32(31))
        for wi in range(5):
            own[wi] = own[wi] | jnp.where(w == wi, bit, jnp.uint32(0))
    r1 = disabled
    r2 = disabled
    r3 = disabled
    for j in range(JT.NUM_JOKERS):
        if not _ELIGIBLE[j]:
            continue
        owned = ((own[j >> 5] >> jnp.uint32(j & 31)) & 1) != 0
        payload = jnp.uint32((_JCOST[j] << 8) | (255 - j))
        k = jnp.where(owned, disabled,
                      _sortable((jkeys[j] & jnp.uint32(0xFFF00000)) | payload))
        t1 = jnp.minimum(r1, k)
        r1 = jnp.maximum(r1, k)
        t2 = jnp.minimum(r2, t1)
        r2 = jnp.maximum(r2, t1)
        r3 = jnp.maximum(r3, t2)
    jids = [255 - (r & 255) for r in (r1, r2, r3)]
    jcosts = [(r >> 8) & 15 for r in (r1, r2, r3)]

    vid = rng.randint(k_vouch, 0, 2)
    vcost = jnp.where(vid == 0, _VOUCHER_COSTS[0], _VOUCHER_COSTS[1])
    card0 = rng.randint(k_cards, 0, 52, 0)
    card1 = rng.randint(k_cards, 0, 52, 1)

    def tc(base):
        return _trunc(base.astype(f32) * mult).astype(i32)

    c = jnp.full((SUB, LANES), 1, i32)
    types = [c * SL.IT_PACK, c * SL.IT_PACK, c * SL.IT_PACK,
             c * SL.IT_JOKER, c * SL.IT_JOKER, c * SL.IT_JOKER,
             c * SL.IT_VOUCHER, c * SL.IT_CARD, c * SL.IT_CARD, zero]
    items = [zero, c * SL.PACK_JOKER, third, jids[0], jids[1], jids[2],
             vid, card0, card1, zero]
    costs = [tc(zero + _PACK_COSTS[0]), tc(zero + _PACK_COSTS[1]),
             tc(third_cost), tc(jcosts[0]), tc(jcosts[1]), tc(jcosts[2]),
             tc(vcost), zero + SL.CARD_COST, zero + SL.CARD_COST, zero]
    return types, items, costs, zero + SL.N_ITEMS, mult


# ---------------------------------------------------------------------------
# Play / discard branches (mirror of full_env._play_hand / _discard)
# ---------------------------------------------------------------------------


def _cnt_of(s, ids):
    out = {}
    for j in ids:
        acc = jnp.zeros((SUB, LANES), i32)
        for sl_ in range(N_JOK):
            acc = acc + (s["jok"][sl_] == j).astype(i32)
        out[j] = acc
    return out


def _bp_test(s, slot):
    """Bit of the boss-played bitset at deck slot `slot` (i32 vector)."""
    sh = jnp.clip(slot, 0, 63).astype(u32)
    lo = (s["bp_lo"] >> (sh & jnp.uint32(31))) & 1
    hi = (s["bp_hi"] >> (sh & jnp.uint32(31))) & 1
    return jnp.where(slot < 32, _bitcast(lo, i32), _bitcast(hi, i32))


def _play_branch(s, rng, view):
    """Everything _play_hand does except _advance_round (deferred/shared),
    the refill draw and the boss on-hand-drawn pass (applied post-merge).

    Returns (upd_core, reward, beat, fail, boss_ok, k_boss)."""
    zero = jnp.zeros((SUB, LANES), i32)
    zf = jnp.zeros((SUB, LANES), f32)
    ranks, suits, enh, ed, seal, present = view

    k_eff, ctr1 = rng.stream(s, "card_enhancement")
    s1 = {**s, "ctr": ctr1}
    k_score, ctr2 = rng.stream(s1, "joker_effects")
    s2 = {**s1, "ctr": ctr2}
    k_boss, ctr3 = rng.stream(s2, "boss_abilities")

    sp = _score_play(s, rng, view, k_score)
    sel, ht_is, ht = sp["sel"], sp["ht_is"], sp["ht"]
    n_played, level = sp["n_played"], sp["level"]
    base_score, cnt = sp["base_score"], sp["cnt"]

    # ---- boss play restriction (boss.can_play) ----
    ht_bit = zero
    for h in range(12):
        ht_bit = ht_bit + jnp.where(ht_is[h], (s["btypes"] >> h) & 1, 0)
    psychic_ok = (s["bid"] != B.PSYCHIC) | (n_played == 5)
    eye_ok = (s["bid"] != B.EYE) | (ht_bit == 0)
    mouth_ok = (s["bid"] != B.MOUTH) | (s["btypes"] == 0) | (ht_bit == 1)
    verdant_ok = (s["bid"] != B.VERDANT) | (n_played >= s["bverd"])
    boss_ok = ~s["bact"] | (psychic_ok & eye_ok & mouth_ok & verdant_ok)

    # ---- per-card effects: lucky $20 roll, gold seals, blue seals, red ----
    lucky_money = zero
    gold_money = zero
    for p in range(N_HAND):
        if rng.exact:
            pk = rng.fold(k_eff, p)
            roll = rng.uniform(pk, 2)  # rolls[:, 2] is the money roll
        else:
            roll = rng.uniform(None)
        lucky = sel[p] & (enh[p] == int(C.Enhancement.LUCKY))
        lucky_money = lucky_money + jnp.where(lucky & (roll < C.LUCKY_MONEY_P), 20, 0)
        gold_money = gold_money + jnp.where(
            sel[p] & (seal[p] == int(C.Seal.GOLD)), 3, 0)
    extra_money = lucky_money + gold_money

    n_blue = zero
    n_red = zero
    for p in range(N_HAND):
        n_blue = n_blue + (sel[p] & (seal[p] == int(C.Seal.BLUE))).astype(i32)
        n_red = n_red + (sel[p] & (seal[p] == int(C.Seal.RED))).astype(i32)
    planet_id = zero
    for h in range(12):
        planet_id = planet_id + jnp.where(ht_is[h], _PLANET_OBS[h], 0)
    free = jnp.clip(s["cslots"] - s["cn"], 0, N_CONS)
    n_create = jnp.minimum(n_blue, free)
    new_cons = []
    for c5 in range(N_CONS):
        newly = (c5 >= s["cn"]) & (c5 < s["cn"] + n_create)
        new_cons.append(jnp.where(newly, planet_id, s["cons"][c5]))
    cn2 = s["cn"] + n_create

    # ---- steel held-in-hand x1.5 (full_env._play_hand) ----
    n_steel = zero
    for p in range(N_HAND):
        n_steel = n_steel + (present[p] & ~sel[p]
                             & (enh[p] == int(C.Enhancement.STEEL))).astype(i32)
    sm = _pow_select(n_steel, _P15_F32)
    final = _trunc(base_score.astype(f32) * sm).astype(i32)

    # ---- boss scoring ratio (boss.scoring_ratio, f32 branch) ----
    base_c0 = zero
    base_m0 = zero
    for h in range(12):
        base_c0 = base_c0 + jnp.where(ht_is[h], _BASE_CHIPS[h], 0)
        base_m0 = base_m0 + jnp.where(ht_is[h], _BASE_MULT[h], 0)
    base_c0 = base_c0 + (level - 1) * 10
    base_m0 = base_m0 + (level - 1)
    c = base_c0
    m = base_m0
    c = jnp.where(s["bid"] == B.FLINT, c // 2, c)
    m = jnp.where(s["bid"] == B.FLINT, m // 2, m)
    c = jnp.where(s["bid"] == B.OXIDE, 0, c)
    c = jnp.where(s["bid"] == B.ARM, _trunc(c.astype(f32) * 0.75).astype(i32), c)
    m = jnp.where(s["bid"] == B.ARM, _trunc(m.astype(f32) * 0.75).astype(i32), m)
    plant = zero
    pillar = zero
    for p in range(N_HAND):
        face_p = sel[p] & (ranks[p] >= 11) & (ranks[p] <= 13)
        plant = plant + face_p.astype(i32)
        pb = sel[p] & (_bp_test(s, s["hidx"][p]) == 1)
        pillar = pillar + pb.astype(i32)
    nd = jnp.where(s["bid"] == B.PLANT, plant,
                   jnp.where(s["bid"] == B.VIOLET, n_played,
                             jnp.where(s["bid"] == B.PILLAR, pillar, 0)))
    pen = _pow_select(nd, _P08_F32)
    c = jnp.where(nd > 0, _trunc(c.astype(f32) * pen).astype(i32), c)
    m = jnp.where(nd > 0, _trunc(m.astype(f32) * pen).astype(i32), m)
    ratio = ((c.astype(f32) / jnp.maximum(1, base_c0).astype(f32))
             * (m.astype(f32) / jnp.maximum(1, base_m0).astype(f32)))
    ok = s["bact"] & (base_c0 > 0) & (base_m0 > 0)
    ratio = jnp.where(ok, ratio, 1.0)
    final = _trunc(final.astype(f32) * ratio).astype(i32)

    # ---- red-seal retrigger ----
    final = _trunc(final.astype(f32)
                   * (1.0 + 0.5 * n_red.astype(f32))).astype(i32)

    # ---- state updates ----
    old_prog = jnp.minimum(1.0, s["rchips"].astype(f32)
                           / jnp.maximum(1, s["need"]).astype(f32))
    round2 = s["rchips"] + final
    new_prog = jnp.minimum(1.0, round2.astype(f32)
                           / jnp.maximum(1, s["need"]).astype(f32))

    any_face = jnp.zeros((SUB, LANES), bool)
    for p in range(N_HAND):
        any_face = any_face | (sel[p] & (ranks[p] >= 11) & (ranks[p] <= 13))

    ht_pow = zero
    for h in range(12):
        ht_pow = ht_pow + jnp.where(ht_is[h], 1 << h, 0)
    gate = [sel[p] & s["bact"] for p in range(N_HAND)]
    blo, bhi = _slot_bits(s["hidx"], gate)

    upd = {
        "money": s["money"] + extra_money,
        "cons": new_cons, "cn": cn2,
        "rchips": round2, "career": s["career"] + final,
        "hpt": s["hpt"] + 1, "hpa": s["hpa"] + 1,
        "best": jnp.maximum(s["best"], final),
        "pc": [s["pc"][h] + ht_is[h].astype(i32) for h in range(12)],
        "green": s["green"] + 1,
        "sel": [jnp.zeros((SUB, LANES), bool) for _ in range(N_HAND)],
        "high": sp["high"],
        "bus": jnp.where(any_face, 0, s["bus"] + 1),
        "btypes": s["btypes"] | jnp.where(s["bact"], ht_pow, 0),
        "bfirst": s["bfirst"] & ~s["bact"],
        "bp_lo": s["bp_lo"] | blo, "bp_hi": s["bp_hi"] | bhi,
        "bverd": jnp.where(s["bact"] & (s["bid"] == B.VERDANT),
                           jnp.minimum(7, s["bverd"] + 1), s["bverd"]),
        "ctr": ctr3,
    }

    # ---- reward shaping (full_env._play_hand) ----
    progress_reward = 15.0 * new_prog
    milestone = jnp.where(
        (old_prog < 0.25) & (new_prog >= 0.25), 5.0,
        jnp.where((old_prog < 0.5) & (new_prog >= 0.5), 10.0,
                  jnp.where((old_prog < 0.75) & (new_prog >= 0.75), 15.0,
                            jnp.where((old_prog < 1.0) & (new_prog >= 1.0),
                                      25.0, 0.0))))
    ff = final.astype(f32)
    score_reward = jnp.where(
        s["ante"] <= 3,
        jnp.minimum(10.0, ff / 100.0),
        jnp.minimum(10.0, 3.0 * jnp.log(jnp.maximum(1, final).astype(f32))
                    / np.float32(np.log(10.0))))
    quality = zf
    for h in range(12):
        if _HAND_QUALITY[h]:
            quality = quality + jnp.where(ht_is[h], _HAND_QUALITY[h], 0.0)
    HT = HandType
    efficiency = jnp.where(
        (ht >= int(HT.THREE_KIND)) & (n_played <= 3), 2.0,
        jnp.where((ht >= int(HT.FLUSH)) & (n_played == 5), 1.0,
                  jnp.where((n_played <= 4) & (s["hl"] <= 2), 1.5, 0.0)))
    flush_syn = (cnt[JT.J_FOUR_FINGERS] + cnt[JT.J_SHORTCUT] + cnt[113]) > 0
    pair_syn = (cnt[JT.J_ODD_TODD] + cnt[JT.J_EVEN_STEVEN]
                + cnt[JT.J_JOLLY] + cnt[JT.J_ZANY]) > 0
    face_syn = (cnt[JT.J_SCARY_FACE] + cnt[JT.J_SMILEY_FACE] + cnt[42]) > 0
    n_face = zf
    for p in range(N_HAND):
        n_face = n_face + (sel[p] & (ranks[p] >= 11)).astype(f32)
    synergy = jnp.where((ht == int(HT.FLUSH)) & flush_syn, 2.0, 0.0)
    is_pairish = ((ht == int(HT.ONE_PAIR)) | (ht == int(HT.TWO_PAIR))
                  | (ht == int(HT.THREE_KIND)))
    synergy = synergy + jnp.where(is_pairish & pair_syn, 1.5, 0.0)
    synergy = synergy + jnp.where((n_face > 0) & face_syn, 0.5 * n_face, 0.0)
    strategy = jnp.where((new_prog > 0.7) & (s["hl"] >= 3), 2.0,
                         jnp.where((new_prog < 0.3) & (ht >= int(HT.FLUSH)),
                                   3.0, 0.0))
    ante_bonus = jnp.where(
        s["ante"] >= 4, jnp.minimum(5.0, (s["ante"] - 3).astype(f32) * 0.5), 0.0)
    reward = (progress_reward + milestone + score_reward + quality * 2.0
              + efficiency * 1.5 + synergy * 3.0 + strategy * 2.0 + ante_bonus)
    reward = jnp.minimum(reward, 100.0)

    beat = round2 >= s["need"]
    fail = ~beat & (s["hl"] <= 1)
    reward = reward + jnp.where(
        beat, jnp.minimum(50.0, 25.0 + 10.0 * s["ante"].astype(f32)), 0.0)
    reward = reward + jnp.where(fail, -50.0 * (1.0 - new_prog), 0.0)
    return upd, reward, beat, fail, boss_ok, k_boss


def _discard_branch(s, rng, view):
    """Mirror of full_env._discard (draw applied post-merge).

    Returns (upd, reward, rem): the hand-position removal mask ``rem`` is
    returned instead of applied — ``_step`` routes it through the SHARED
    pre-draw ``_remove_positions`` instantiation (one compaction serves the
    discard and consumable-destroy lanes, which are disjoint and both
    compact the same pre-step hand)."""
    zero = jnp.zeros((SUB, LANES), i32)
    ranks, suits, enh, ed, seal, present = view
    sel = [s["sel"][p] & present[p] for p in range(N_HAND)]
    n_sel = zero
    for p in range(N_HAND):
        n_sel = n_sel + sel[p].astype(i32)

    k_seal, ctrD = rng.stream(s, "seal_applications")

    n_purple = zero
    for p in range(N_HAND):
        n_purple = n_purple + (sel[p] & (seal[p] == int(C.Seal.PURPLE))).astype(i32)
    free = jnp.clip(s["cslots"] - s["cn"], 0, N_CONS)
    n_tarot = jnp.minimum(n_purple, free)
    new_cons = []
    for c5 in range(N_CONS):
        if rng.exact:
            tid = KR.randint(*rng.fold(k_seal, c5), 1, 23)
        else:
            tid = rng.randint(None, 1, 23)
        newly = (c5 >= s["cn"]) & (c5 < s["cn"] + n_tarot)
        new_cons.append(jnp.where(newly, tid, s["cons"][c5]))

    cnt = _cnt_of(s, (JT.J_TRADING_CARD, JT.J_FACELESS, 130, 82, JT.J_LUCHADOR))
    is_first = s["dl"] == 3
    trading = (cnt[JT.J_TRADING_CARD] > 0) & is_first & (n_sel == 1)
    n_face_disc = zero
    for p in range(N_HAND):
        n_face_disc = n_face_disc + (sel[p] & (ranks[p] >= 11)
                                     & (ranks[p] <= 13)).astype(i32)
    faceless = (cnt[JT.J_FACELESS] > 0) & (n_face_disc >= 3)
    money_disc = jnp.where(trading, 3, 0) + jnp.where(faceless, 5, 0)
    n_syn = (cnt[JT.J_FACELESS] + cnt[130] + cnt[82] + cnt[JT.J_LUCHADOR])

    upd = {
        "money": s["money"] + money_disc,
        "cons": new_cons, "cn": s["cn"] + n_tarot,
        "green": jnp.maximum(0, s["green"] - 1),
        "dl": s["dl"] - 1,
        "ctr": ctrD,
    }
    # union removal (#A39): selected + stale play highlights, positions
    # >= hand_n skipped (the descending removal's length guard).
    rem = [(sel[p] | s["high"][p])
           & (jnp.full((SUB, LANES), p, i32) < s["hn"])
           for p in range(N_HAND)]
    upd["sel"] = [jnp.zeros((SUB, LANES), bool) for _ in range(N_HAND)]
    upd["high"] = [jnp.zeros((SUB, LANES), bool) for _ in range(N_HAND)]

    progress = s["rchips"].astype(f32) / jnp.maximum(1, s["need"]).astype(f32)
    dl_post = s["dl"] - 1
    reward = 0.2 + 0.5 * n_syn.astype(f32) + money_disc.astype(f32) / 5.0
    reward = reward + jnp.where(
        (progress < 0.5) & (dl_post > 1), 0.5,
        jnp.where((progress > 0.8) & (dl_post > 1), -0.3, 0.0))
    return upd, reward, rem


# ---------------------------------------------------------------------------
# Consumables (mirror of engine/consumable_logic.use_consumable)
# ---------------------------------------------------------------------------


def _append5(cons, cn, val, gate):
    """_append_cons: append `val` if gate and a physical slot is free."""
    can = gate & (cn < N_CONS)
    out = []
    for c5 in range(N_CONS):
        out.append(jnp.where(can & (cn == c5), val, cons[c5]))
    return out, cn + can.astype(i32)


def _kill_to_rem(s, kill_lo, kill_hi):
    """Hand-position mask of killed deck slots (bitset test per position)."""
    rem = []
    for p in range(N_HAND):
        hp = s["hidx"][p]
        sh = jnp.clip(hp, 0, 63).astype(u32)
        lo = _bitcast((kill_lo >> (sh & jnp.uint32(31))) & 1, i32)
        hi = _bitcast((kill_hi >> (sh & jnp.uint32(31))) & 1, i32)
        bit = jnp.where(hp < 32, lo, hi)
        rem.append((hp >= 0) & (bit == 1))
    return rem


def _rows_to_bits(rows):
    lo = jnp.zeros((SUB, LANES), u32)
    hi = jnp.zeros((SUB, LANES), u32)
    for d in range(N_DECK):
        if d < 32:
            lo = lo | jnp.where(rows[d], jnp.uint32(1 << d), jnp.uint32(0))
        else:
            hi = hi | jnp.where(rows[d], jnp.uint32(1 << (d - 32)), jnp.uint32(0))
    return lo, hi


def _create_cards(s, n, ranks4, suits4, enhs4):
    """_create_cards: fill the highest free slots (descending) with up to 4
    new cards; clears stale Pillar marks on reused slots."""
    free = [~s["al"][d] for d in range(N_DECK)]
    csum = jnp.zeros((SUB, LANES), i32)
    take = [None] * N_DECK
    for d in range(N_DECK - 1, -1, -1):
        csum = csum + free[d].astype(i32)
        take[d] = free[d] & (csum <= n)
    # Packed card words (rk 0-3 | su 4-7 | en 8-11): the 64x4 (slot,
    # ordinal) grid costs one compare+select per pair instead of three.
    pk4 = [ranks4[k] | (suits4[k] << 4) | (enhs4[k] << 8) for k in range(4)]
    rk = list(s["rk"])
    su = list(s["su"])
    en = list(s["en"])
    edt = list(s["edt"])
    slc = list(s["slc"])
    al = list(s["al"])
    tlo, thi = _rows_to_bits(take)
    # Route precompute (see _draw_pass): ordinal of taken slot d = #takes at
    # slots below d, folded with `take` into one word so the grid pays one
    # compare+select per (slot, ordinal) pair.
    neg1 = jnp.full((SUB, LANES), -1, i32)
    ordinal = jnp.zeros((SUB, LANES), i32)
    route = [None] * N_DECK
    for d in range(N_DECK):
        route[d] = jnp.where(take[d], ordinal, neg1)
        ordinal = ordinal + take[d].astype(i32)
    for d in range(N_DECK):
        nv = jnp.zeros((SUB, LANES), i32)
        for k in range(4):
            nv = jnp.where(route[d] == k, pk4[k], nv)
        tk = take[d]
        rk[d] = jnp.where(tk, nv & 15, rk[d])
        su[d] = jnp.where(tk, (nv >> 4) & 15, su[d])
        en[d] = jnp.where(tk, (nv >> 8) & 15, en[d])
        edt[d] = jnp.where(tk, 0, edt[d])
        slc[d] = jnp.where(tk, 0, slc[d])
        al[d] = al[d] | tk
    return {"rk": rk, "su": su, "en": en, "edt": edt, "slc": slc, "al": al,
            "bp_lo": s["bp_lo"] & ~tlo, "bp_hi": s["bp_hi"] & ~thi}


def _consumable_branch(s, rng, view, a, live):
    """Mirror of consumable_logic.use_consumable. Returns (upd, reward).

    ``live`` (the step's do_use predicate) voids ``cid`` on non-consumable
    lanes: every case predicate below derives from ``cid``, so every state
    write self-gates and the returned rows equal ``s`` wherever ``live`` is
    false — the caller uses them as the merge BASE instead of paying a
    ~470-row full select (only the unconditional selection-clear and
    stream-counter writes still merge under do_use)."""
    zero = jnp.zeros((SUB, LANES), i32)
    zf = jnp.zeros((SUB, LANES), f32)
    false = jnp.zeros((SUB, LANES), bool)
    ranks, suits, enh, ed, seal, present = view

    idx = jnp.clip(a - Action.USE_CONSUMABLE_BASE, 0, N_CONS - 1)
    raw = zero
    for c5 in range(N_CONS):
        raw = jnp.where(idx == c5, s["cons"][c5], raw)
    cid = jnp.where(raw >= CL.ENUMNAME_OFFSET, raw - CL.ENUMNAME_OFFSET, raw)
    cid = jnp.where(live, cid, -1)

    sel = [s["sel"][p] & present[p] for p in range(N_HAND)]
    n_sel = zero
    for p in range(N_HAND):
        n_sel = n_sel + sel[p].astype(i32)

    key, ctrC = rng.stream(s, "consumable_effects")
    k1 = rng.child(key, 0)
    k2 = rng.child(key, 1)
    k3 = rng.child(key, 2)
    k4 = rng.child(key, 3)

    reward = zf
    success = false
    cs = dict(s)
    cs["ctr"] = ctrC

    is_tarot = (cid >= CL.TAROT_BASE) & (cid < CL.TAROT_BASE + CL.NUM_TAROT)
    is_planet = (cid >= CL.PLANET_BASE) & (cid < CL.PLANET_BASE + CL.NUM_PLANET)
    is_spectral = (cid >= CL.SPECTRAL_BASE) & (cid < CL.SPECTRAL_BASE + CL.NUM_SPECTRAL)

    # Targeting masks shared by several cases below.
    tgt1 = _first_k_selected(sel, jnp.full((SUB, LANES), 1, i32))
    t164 = _hand_to_deck(s, tgt1)

    if "cons_mods" not in _ABLATE:
        # ---- enhancement tarots ----
        enh_val = zero
        enh_k = zero
        for t in range(1, 23):
            if _ENH_TAROT[t]:
                enh_val = enh_val + jnp.where(is_tarot & (cid == t), _ENH_TAROT[t], 0)
                enh_k = enh_k + jnp.where(is_tarot & (cid == t), _ENH_COUNT[t], 0)
        tgt_enh = _first_k_selected(sel, enh_k)
        do_enh = is_tarot & (enh_val > 0) & (n_sel >= 1)
        tgt64 = _hand_to_deck(s, tgt_enh)
        cs["en"] = [jnp.where(do_enh & tgt64[d], enh_val, cs["en"][d])
                    for d in range(N_DECK)]
        cs["hen"] = [jnp.where(do_enh & tgt_enh[p], enh_val, cs["hen"][p])
                     for p in range(N_HAND)]
        n_tgt = zero
        for p in range(N_HAND):
            n_tgt = n_tgt + tgt_enh[p].astype(i32)
        reward = reward + jnp.where(do_enh, 2.0 * n_tgt.astype(f32), 0.0)
        success = success | do_enh

        # ---- seal spectrals (first selected) ----
        seal_val = zero
        for sp_ in range(50, 68):
            if _SEAL_SPEC[sp_]:
                seal_val = seal_val + jnp.where(is_spectral & (cid == sp_), _SEAL_SPEC[sp_], 0)
        do_seal = is_spectral & (seal_val > 0) & (n_sel >= 1)
        cs["slc"] = [jnp.where(do_seal & t164[d], seal_val, cs["slc"][d])
                     for d in range(N_DECK)]
        cs["hsl"] = [jnp.where(do_seal & tgt1[p], seal_val, cs["hsl"][p])
                     for p in range(N_HAND)]
        reward = reward + jnp.where(do_seal, 2.0, 0.0)
        success = success | do_seal

        # ---- Aura / Wheel of Fortune editions on the first selected ----
        do_aura = (cid == CL.AURA) & (n_sel >= 1)
        ar = rng.randint(k1, 0, 3)
        aura_ed = zero
        for k in range(3):
            aura_ed = aura_ed + jnp.where(ar == k, _EDITIONS3[k], 0)
        fired = rng.uniform(k1) < 0.25
        do_wheel = (cid == CL.WHEEL) & (n_sel >= 1) & fired
        wr = rng.randint(k2, 0, 3)
        wheel_ed = zero
        for k in range(3):
            wheel_ed = wheel_ed + jnp.where(wr == k, _EDITIONS3[k], 0)
        ed_do = do_aura | do_wheel
        ed_val = jnp.where(do_aura, aura_ed, wheel_ed)
        cs["edt"] = [jnp.where(ed_do & t164[d], ed_val, cs["edt"][d])
                     for d in range(N_DECK)]
        cs["hed"] = [jnp.where(ed_do & tgt1[p], ed_val, cs["hed"][p])
                     for p in range(N_HAND)]
        reward = reward + jnp.where(ed_do, 2.0, 0.0)
        success = success | ed_do

    # ---- dropped-sync tarots (reward only) ----
    do_strength = (cid == CL.STRENGTH) & (n_sel >= 1)
    tgt2 = _first_k_selected(sel, jnp.full((SUB, LANES), 2, i32))
    n_strength = zf
    for p in range(N_HAND):
        n_strength = n_strength + (tgt2[p] & (ranks[p] < 14)).astype(f32)
    reward = reward + jnp.where(do_strength, 2.0 * n_strength, 0.0)
    success = success | do_strength
    do_death = (cid == CL.DEATH) & (n_sel >= 2)
    reward = reward + jnp.where(do_death, 4.0, 0.0)
    success = success | do_death
    is_conv = ((cid == CL.STAR) | (cid == CL.MOON) | (cid == CL.SUN)
               | (cid == CL.WORLD))
    do_conv = is_conv & (n_sel >= 1)
    reward = reward + jnp.where(
        do_conv, 2.0 * jnp.minimum(3, n_sel).astype(f32), 0.0)
    success = success | do_conv

    # ---- money tarots ----
    do_hermit = cid == CL.HERMIT
    do_temper = cid == CL.TEMPERANCE
    hermit_gain = jnp.minimum(jnp.maximum(s["money"], 0), 20)
    temper_gain = jnp.minimum(5 * s["jn"], 50)
    gain = jnp.where(do_hermit, hermit_gain, jnp.where(do_temper, temper_gain, 0))
    cs["money"] = cs["money"] + gain
    reward = reward + gain.astype(f32) / 10.0
    success = success | do_hermit | do_temper

    # ---- planets ----
    pidx = jnp.clip(cid - CL.PLANET_BASE, 0, 11)
    new_lvl = []
    for h in range(12):
        gate = jnp.zeros((SUB, LANES), bool)
        for pi in range(12):
            if _PLANET_HAND[pi] == h:
                gate = gate | (pidx == pi)
        new_lvl.append(cs["lvl"][h] + (is_planet & gate).astype(i32))
    cs["lvl"] = new_lvl
    reward = reward + jnp.where(is_planet, 10.0, 0.0)
    success = success | is_planet

    # ---- consumable-creating tarots (double-append quirk) ----
    if "cons_crea" in _ABLATE:
        pending, pend0, pend1 = zero, zero, zero
    else:
        gate1 = s["cn"] < s["cslots"]
        gate2 = s["cn"] + 1 < s["cslots"]
        p9_0 = CL.PLANET_BASE + rng.randint(k2, 0, 9, 0)
        p9_1 = CL.PLANET_BASE + rng.randint(k2, 0, 9, 1)
        t22_0 = CL.ENUMNAME_OFFSET + CL.TAROT_BASE + rng.randint(k2, 0, 22, 0)
        t22_1 = CL.ENUMNAME_OFFSET + CL.TAROT_BASE + rng.randint(k2, 0, 22, 1)
        fool_i = rng.randint(k2, 0, jnp.maximum(1, s["cn"]))
        fool_pick = zero
        for c5 in range(N_CONS):
            fool_pick = jnp.where(fool_i == c5, s["cons"][c5], fool_pick)

        do_hp = cid == CL.HIGH_PRIESTESS
        do_emp = cid == CL.EMPEROR
        do_judge = cid == CL.JUDGEMENT
        do_fool = (cid == CL.FOOL) & (s["cn"] > 0)
        make_two = do_hp | do_emp
        v0 = jnp.where(do_emp, t22_0, p9_0)
        v1 = jnp.where(do_emp, t22_1, p9_1)
        c0, n0 = cs["cons"], cs["cn"]
        c1, n1 = _append5(c0, n0, v0, make_two & gate1)
        c2, n2 = _append5(c1, n1, v1, make_two & gate2 & (n1 > n0))
        c3, n3 = _append5(c2, n2, p9_0, do_judge & gate1)
        c4, n4 = _append5(c3, n3, fool_pick, do_fool)
        cs["cons"], cs["cn"] = c4, n4
        items1 = (n1 > n0).astype(i32) + (n2 > n1).astype(i32) + (n3 > n2).astype(i32)
        fool_items = (n4 > n3).astype(i32)
        reward = reward + jnp.where(make_two | do_judge,
                                    5.0 * items1.astype(f32), 0.0)
        reward = reward + jnp.where(do_fool, 5.0 * fool_items.astype(f32), 0.0)
        success = success | make_two | do_judge | do_fool
        pending = jnp.where(make_two | do_judge, items1,
                            jnp.where(do_fool, fool_items, 0))
        pend0 = jnp.where(do_fool, fool_pick, jnp.where(do_judge, p9_0, v0))
        pend1 = v1

    # ---- joker-creating spectrals ----
    jslot_free = s["jn"] < s["jslots"]
    do_wraith = (cid == CL.WRAITH) & jslot_free
    do_soul = (cid == CL.THE_SOUL) & jslot_free
    wi = rng.randint(k3, 0, 14)
    wid = zero
    for k in range(14):
        wid = wid + jnp.where(wi == k, _WRAITH[k], 0)
    si = rng.randint(k3, 0, 5)
    sid = zero
    for k in range(5):
        sid = sid + jnp.where(si == k, _SOUL[k], 0)
    new_jid = jnp.where(do_soul, sid, wid)
    add_joker = (do_wraith | do_soul) & (new_jid > 0)
    cs["jok"] = [jnp.where(add_joker & (jnp.clip(s["jn"], 0, N_JOK - 1) == sl_),
                           new_jid, cs["jok"][sl_]) for sl_ in range(N_JOK)]
    cs["jn"] = cs["jn"] + add_joker.astype(i32)
    reward = reward + jnp.where(do_wraith | do_soul, 15.0, 0.0)
    success = success | do_wraith | do_soul

    # ---- hand-size modifiers ----
    do_ecto = (cid == CL.ECTOPLASM) & (s["jn"] > 0)
    do_ouija = (cid == CL.OUIJA) & (s["hn"] > 0)
    cs["hsize"] = cs["hsize"] + jnp.where(do_wraith | do_ecto | do_ouija, -1, 0)
    success = success | do_ecto

    # ---- Ankh / Hex / Black Hole ----
    do_ankh = (cid == CL.ANKH) & (s["jn"] > 0)
    reward = reward + jnp.where(do_ankh, 15.0, 0.0)
    success = success | do_ankh | ((cid == CL.HEX) & (s["jn"] > 0))
    success = success | (cid == CL.BLACK_HOLE)

    # ---- merged destroy/create cases: Hanged Man / Familiar-Grim-
    # Incantation / Immolate / Cryptid ------------------------------------
    # The four cases are mutually exclusive in `cid`, so ONE `_destroy` and
    # ONE `_create_cards` instantiation serve all of them — separately they
    # were ~30% of kernel step time (docs/ablate_fused_full_r05.jsonl,
    # stubs cons_hang/cons_fgi/cons_immo/cons_cryptid). Hazard-evading
    # formulation (docs/ROUND4.md §2: the r04 merge diverged ON CHIP inside
    # the multi-trip scf.for program with long-lived parallel state dicts):
    # each merged update is applied into `cs` IMMEDIATELY (destroy → apply
    # → create FROM cs → apply) so live ranges match the proven unmerged
    # structure. The create step may read `cs` because it only LANDS on
    # lanes where `cs` equals the post-destroy state (all other case gates
    # are false there). Gated by the on-chip fed battery
    # (scripts/validate_fused_full_tpu.py) before any bench.
    if "cons_hang" in _ABLATE:
        do_hang = false
        hang64 = [false] * N_DECK
    else:
        do_hang = (cid == CL.HANGED_MAN) & (n_sel >= 1)
        hang64 = _hand_to_deck(s, tgt2)

    if "cons_fgi" in _ABLATE:
        do_fgi = false
        n_create = zero
        ranks4 = [zero] * 4
        suits4 = [zero] * 4
        enhs4 = [zero] * 4
    else:
        is_fgi = (cid == CL.FAMILIAR) | (cid == CL.GRIM) | (cid == CL.INCANTATION)
        do_fgi = is_fgi & (n_sel >= 1)
        n_create = jnp.where(cid == CL.FAMILIAR, 3, jnp.where(cid == CL.GRIM, 2, 4))
        ranks4 = []
        for k in range(4):
            ck = rng.child(k4, k)
            fam = 11 + rng.randint(ck, 0, 3)
            inc = 2 + rng.randint(ck, 0, 9)
            ranks4.append(jnp.where(cid == CL.FAMILIAR, fam,
                                    jnp.where(cid == CL.GRIM, 14, inc)))
        k9 = rng.fold(k4, 9)
        k10 = rng.fold(k4, 10)
        suits4 = [rng.randint(k9, 0, 4, k) for k in range(4)]
        enhs4 = []
        for k in range(4):
            ei = rng.randint(k10, 0, 7, k)
            ev = zero
            for q in range(7):
                ev = ev + jnp.where(ei == q, _ENH_POOL7[q], 0)
            enhs4.append(ev)

    if "cons_immo" in _ABLATE:
        do_immo = false
        ikill = [false] * N_DECK
        n_killed = zero
    else:
        # ONE top-5 min/max insertion cascade over PACKED priority words
        # (key25 | 127-slot), mirroring consumable_logic's Immolate ordering
        # bit-for-bit (see its docstring). Unique strictly-positive payloads
        # mean no ties and no collision with the I32_MIN dead sentinel; the
        # kill SET decodes from the winners' low 7 bits into a u32 bitset,
        # and n_killed == n_kill by construction (winners are distinct
        # alive slots). Replaces five argmax+knockout passes
        # (~2.2k -> ~1.2k vector ops for this stage).
        do_immo = cid == CL.IMMOLATE
        if rng.exact:
            ikeys = [KR.random_bits32(k3[0], k3[1], jnp.full((SUB, LANES), d, u32))
                     for d in range(N_DECK)]
        else:
            ib = _bitcast(pltpu.prng_random_bits((N_DECK, SUB, LANES)), u32)
            ikeys = [ib[d] for d in range(N_DECK)]
        dis_d = jnp.full((SUB, LANES), _SORT_FLIP, i32)
        r_im = [dis_d] * 5
        for d in range(N_DECK):
            kd = jnp.where(
                s["al"][d],
                _sortable((ikeys[d] & jnp.uint32(0xFFFFFF80))
                          | jnp.uint32(127 - d)), dis_d)
            t = kd
            for i in range(4):
                t_nxt = jnp.minimum(r_im[i], t)
                r_im[i] = jnp.maximum(r_im[i], t)
                t = t_nxt
            r_im[4] = jnp.maximum(r_im[4], t)
        n_alive = zero
        for d in range(N_DECK):
            n_alive = n_alive + s["al"][d].astype(i32)
        n_kill = jnp.minimum(5, n_alive)
        klo = jnp.zeros((SUB, LANES), u32)
        khi = jnp.zeros((SUB, LANES), u32)
        for i in range(5):
            # i < n_kill implies r_im[i] is a real winner (>= i+1 alive)
            vi = jnp.full((SUB, LANES), i, i32) < n_kill
            w = 127 - (r_im[i] & 127)
            bit = jnp.uint32(1) << (_bitcast(w, u32) & jnp.uint32(31))
            klo = klo | jnp.where(vi & (w < 32), bit, jnp.uint32(0))
            khi = khi | jnp.where(vi & (w >= 32), bit, jnp.uint32(0))
        ikill = [((((klo if d < 32 else khi) >> jnp.uint32(d % 32)) & 1) != 0)
                 for d in range(N_DECK)]
        n_killed = n_kill

    if "cons_cryptid" in _ABLATE:
        do_cryptid = false
        src_rk = zero
        src_su = zero
        src_en = zero
    else:
        do_cryptid = (cid == CL.CRYPTID) & (n_sel >= 1)
        src_rk = zero
        src_su = zero
        src_en = zero
        for p in range(N_HAND):
            src_rk = jnp.where(tgt1[p], ranks[p], src_rk)
            src_su = jnp.where(tgt1[p], suits[p], src_su)
            src_en = jnp.where(tgt1[p], enh[p], src_en)

    # one destroy for all three destroying cases. The dead-mark self-gates
    # (dc_kill rows are cid-gated); the hand-side compaction is DEFERRED to
    # _step's shared pre-draw _remove_positions — the discard and
    # consumable-destroy lanes are disjoint and both compact the same
    # pre-step hand, so one instantiation (~780 vector eqns) serves both.
    dc_kill = [(do_hang & hang64[d]) | (do_fgi & t164[d])
               | (do_immo & ikill[d]) for d in range(N_DECK)]
    dc_destroy = do_hang | do_fgi | do_immo
    if "cons_dc" not in _ABLATE:
        cs["al"] = [cs["al"][d] & ~dc_kill[d] for d in range(N_DECK)]
        klo_dc, khi_dc = _rows_to_bits(dc_kill)
        rem_dc = _kill_to_rem(s, klo_dc, khi_dc)
    else:
        rem_dc = [false] * N_HAND
    cs["money"] = jnp.where(do_immo, s["money"] + 20, cs["money"])

    n_hang = zero
    for p in range(N_HAND):
        n_hang = n_hang + tgt2[p].astype(i32)
    reward = reward + jnp.where(do_hang, 2.0 * n_hang.astype(f32), 0.0)
    reward = reward + jnp.where(do_fgi, 3.0 * n_create.astype(f32) + 1.0, 0.0)
    reward = reward + jnp.where(do_immo, n_killed.astype(f32) + 2.0, 0.0)
    reward = reward + jnp.where(do_cryptid, 6.0, 0.0)
    success = success | do_hang | do_fgi | do_immo | do_cryptid

    # one create for both creating cases, reading the already-merged cs.
    # No _msel needed: cr_n is 0 on every non-creating lane, so every
    # _create_cards row write is already gated row-wise by `take` (all
    # false at n=0) — the update is identity there (~390 selects saved).
    cr_n = jnp.where(do_fgi, n_create, jnp.where(do_cryptid, 2, 0))
    cr_rk = [jnp.where(do_cryptid, src_rk, ranks4[k]) for k in range(4)]
    cr_su = [jnp.where(do_cryptid, src_su, suits4[k]) for k in range(4)]
    cr_en = [jnp.where(do_cryptid, src_en, enhs4[k]) for k in range(4)]
    if "cons_dc" not in _ABLATE:
        cs.update(_create_cards(cs, cr_n, cr_rk, cr_su, cr_en))

    # ---- Sigil / Ouija whole-hand conversions ----
    if "cons_sigil" not in _ABLATE:
        do_sigil = (cid == CL.SIGIL) & (s["hn"] > 0)
        conv_suit = rng.randint(k3, 0, 4)
        conv_rank = 2 + rng.randint(k3, 0, 13)
        ihr = _inhand_rows(s)
        cs["su"] = [jnp.where(do_sigil & ihr[d], conv_suit, cs["su"][d])
                    for d in range(N_DECK)]
        cs["rk"] = [jnp.where(do_ouija & ihr[d], conv_rank, cs["rk"][d])
                    for d in range(N_DECK)]
        for p in range(N_HAND):
            held = jnp.full((SUB, LANES), p, i32) < s["hn"]
            cs["hsu"][p] = jnp.where(do_sigil & held, conv_suit, cs["hsu"][p])
            cs["hrk"][p] = jnp.where(do_ouija & held, conv_rank, cs["hrk"][p])
        reward = reward + jnp.where(do_sigil | do_ouija,
                                    2.0 * s["hn"].astype(f32), 0.0)
        success = success | do_sigil | do_ouija

    # ---- consume on success: pop slot idx, then env re-append ----
    popped = []
    for c5 in range(N_CONS):
        nxt = cs["cons"][c5 + 1] if c5 + 1 < N_CONS else zero
        v = jnp.where(c5 < idx, cs["cons"][c5], nxt)
        popped.append(jnp.where(c5 >= cs["cn"] - 1, 0, v))
    cs["cons"] = [jnp.where(success, popped[c5], cs["cons"][c5])
                  for c5 in range(N_CONS)]
    cs["cn"] = cs["cn"] - success.astype(i32)
    cc, nn = _append5(cs["cons"], cs["cn"], pend0,
                      (pending >= 1) & (cs["cn"] < s["cslots"]))
    cc, nn = _append5(cc, nn, pend1, (pending >= 2) & (nn < s["cslots"]))
    cs["cons"], cs["cn"] = cc, nn

    cs["sel"] = [false for _ in range(N_HAND)]
    # No failure select needed: EVERY cs write above is gated by a case
    # predicate that implies `success` (hermit/temperance/planets/Black
    # Hole succeed unconditionally; all targeted cases carry their own
    # gates), so on failure lanes cs already equals s + cleared selection +
    # advanced counters. The old formulation materialized a full-state
    # _msel(success, cs, fail_s) here — ~450 row selects of pure identity.
    reward = jnp.where(success, reward, -1.0)
    # Return only the keys the branch can touch — shop rows / boss state /
    # phase counters etc. are never modified here. hidx/hn/ih are no longer
    # touched: the destroy compaction is applied by _step's shared
    # _remove_positions (see rem_dc above).
    touched = ("rk", "su", "en", "edt", "slc", "al", "bp_lo", "bp_hi",
               "hrk", "hsu", "hen", "hed", "hsl",
               "sel", "money", "lvl", "cons", "cn",
               "jok", "jn", "hsize", "ctr")
    return {k: cs[k] for k in touched}, reward, rem_dc, dc_destroy


# ---------------------------------------------------------------------------
# Shop actions / blind select / round advance
# ---------------------------------------------------------------------------


def _shop_buy_branch(s, a):
    zero = jnp.zeros((SUB, LANES), i32)
    idx = jnp.clip(a - Action.SHOP_BUY_BASE, 0, N_SHOP - 1)
    itype = zero
    item = zero
    cost = zero
    for r in range(N_SHOP):
        m = idx == r
        itype = jnp.where(m, s["sty"][r], itype)
        item = jnp.where(m, s["sit"][r], item)
        cost = jnp.where(m, s["sco"][r], cost)
    joker_full = s["jn"] >= s["jslots"]
    buy_joker = (itype == SL.IT_JOKER) & ~joker_full
    blocked = (itype == SL.IT_JOKER) & joker_full

    def shift(rows):
        out = []
        for r in range(N_SHOP):
            nxt = rows[r + 1] if r + 1 < N_SHOP else zero
            v = jnp.where(r < idx, rows[r], nxt)
            out.append(jnp.where(r < s["sn"] - 1, v, 0))
        return out

    jpos = jnp.clip(s["jn"], 0, N_JOK - 1)
    upd = {
        "money": s["money"] - cost,
        "sty": shift(s["sty"]), "sit": shift(s["sit"]), "sco": shift(s["sco"]),
        "sn": s["sn"] - 1,
        "jok": [jnp.where(buy_joker & (jpos == sl_), item, s["jok"][sl_])
                for sl_ in range(N_JOK)],
        "jn": s["jn"] + buy_joker.astype(i32),
        "vou": jnp.where(itype == SL.IT_VOUCHER,
                         s["vou"] | jnp.where(item == 0, 1, 2), s["vou"]),
    }
    reward = jnp.where(
        blocked, -1.0,
        jnp.where(itype == SL.IT_PACK, 5.0,
                  jnp.where(itype == SL.IT_JOKER, 15.0,
                            jnp.where(itype == SL.IT_CARD, 3.0,
                                      jnp.where(itype == SL.IT_VOUCHER, 10.0,
                                                -1.0)))))
    return upd, reward


def _sell_branch(s, a):
    zero = jnp.zeros((SUB, LANES), i32)
    idx = jnp.clip(a - Action.SELL_JOKER_BASE, 0, N_JOK - 1)
    jid = zero
    for sl_ in range(N_JOK):
        jid = jnp.where(idx == sl_, s["jok"][sl_], jid)
    value = jnp.full((SUB, LANES), 3, i32)
    for j in range(1, JT.NUM_JOKERS):
        v = max(3, _JCOST[j] // 2)
        if v != 3:
            value = jnp.where(jid == j, v, value)
    new_jok = []
    for sl_ in range(N_JOK):
        nxt = s["jok"][sl_ + 1] if sl_ + 1 < N_JOK else zero
        v = jnp.where(sl_ < idx, s["jok"][sl_], nxt)
        new_jok.append(jnp.where(sl_ >= s["jn"] - 1, 0, v))
    upd = {"jok": new_jok, "jn": s["jn"] - 1,
           "money": s["money"] + value, "jsold": s["jsold"] + 1}
    return upd, value.astype(f32) / 5.0


def _blind_branch(s, rng, a, pow15):
    zero = jnp.zeros((SUB, LANES), i32)
    bt = jnp.clip(a - Action.SELECT_BLIND_BASE, 0, 2)
    base = zero
    ante_c = jnp.clip(s["ante"], 1, 8)
    for ai in range(8):
        for bi in range(3):
            base = base + jnp.where((ante_c - 1 == ai) & (bt == bi),
                                    _BLIND_TABLE[ai][bi], 0)
    extra = jnp.maximum(s["ante"] - 8, 0)
    p15 = jnp.ones((SUB, LANES), f32)
    for k in range(1, 93):
        p15 = jnp.where(extra == k, pow15[k], p15)
    chips = (base.astype(f32) * p15).astype(i32)

    is_boss = bt == 2
    k_boss, ctrB = rng.stream(s, "boss_abilities")
    bid = rng.randint(k_boss, 1, B.N_BOSS)
    cmult = jnp.where(bid == B.WALL, 2.0, 1.0)
    chips = jnp.where(is_boss,
                      _trunc(chips.astype(f32) * cmult).astype(i32), chips)
    upd = {
        "round": bt + 1,
        "need": chips,
        "dl": jnp.where(is_boss & (bid == B.WATER), 0, s["dl"]),
        "hsize": jnp.where(is_boss,
                           s["hsize"] + jnp.where(bid == B.MANACLE, -1, 0),
                           s["hsize"]),
        "hl": jnp.where(is_boss & (bid == B.NEEDLE), 1, s["hl"]),
        "bact": is_boss,
        "bid": jnp.where(is_boss, bid, -1),
        "btypes": zero,
        "bfirst": jnp.ones((SUB, LANES), bool),
        "bverd": jnp.full((SUB, LANES), 5, i32),
        "bp_lo": jnp.zeros((SUB, LANES), u32),
        "bp_hi": jnp.zeros((SUB, LANES), u32),
        "phase": jnp.full((SUB, LANES), int(Phase.PLAY), i32),
        "ctr": ctrB,
    }
    reward = jnp.where(is_boss, 10.0, 0.0)
    return upd, reward


def _advance_branch(adv_in, gen, mult, over_gate_ctr):
    """Mirror of full_env._advance_round on the (possibly play-updated)
    input state; `gen` = shared shop inventory, `mult` its cost multiplier."""
    s = adv_in
    zero = jnp.zeros((SUB, LANES), i32)
    gold = zero
    for p in range(N_HAND):
        held = jnp.full((SUB, LANES), p, i32) < s["hn"]
        gold = gold + (held & (s["hen"][p] == int(C.Enhancement.GOLD))).astype(i32)
    money = s["money"] + gold * C.GOLD_CARD_MONEY
    money = money + jnp.where(s["bact"], 5, 0)  # BOSS_MONEY_REWARD row 1..28

    new_ante = jnp.where(s["round"] == 3, s["ante"] + 1, s["ante"])
    new_round = jnp.where(s["round"] == 3, 1, s["round"] + 1)
    over = new_ante > 100
    money = money + jnp.where(
        over, 0, 25 * new_round + jnp.where(new_round == 3, 10, 0))

    types, items, costs, n9, _ = gen
    rcost = _trunc(jnp.float32(SL.REROLL_BASE) * mult).astype(i32)
    upd = {
        "money": money, "ante": new_ante, "round": new_round,
        "rchips": zero, "best": zero, "hpa": zero,
        "bact": jnp.zeros((SUB, LANES), bool), "bid": jnp.full((SUB, LANES), -1, i32),
        "btypes": zero, "bfirst": jnp.ones((SUB, LANES), bool),
        "bverd": jnp.full((SUB, LANES), 5, i32),
        "bp_lo": jnp.zeros((SUB, LANES), u32),
        "bp_hi": jnp.zeros((SUB, LANES), u32),
        "fd": [jnp.zeros((SUB, LANES), bool) for _ in range(N_HAND)],
        # advanced-only fields, frozen where over:
        "hl": jnp.where(over, s["hl"], 4),
        "dl": jnp.where(over, s["dl"], 3),
        "phase": jnp.where(over, s["phase"], int(Phase.SHOP)),
        "sty": [jnp.where(over, s["sty"][r], types[r]) for r in range(N_SHOP)],
        "sit": [jnp.where(over, s["sit"][r], items[r]) for r in range(N_SHOP)],
        "sco": [jnp.where(over, s["sco"][r], costs[r]) for r in range(N_SHOP)],
        "sn": jnp.where(over, s["sn"], n9),
        "rbase": jnp.where(over, s["rbase"], SL.REROLL_BASE),
        "rcost": jnp.where(over, s["rcost"], rcost),
        "ctr": [s["ctr"][k] + (jnp.where(~over & over_gate_ctr,
                                         1, 0)).astype(u32)
                if k == _STREAM["shop_generation"] else s["ctr"][k]
                for k in range(N_CTR)],
    }
    return upd, over


# ---------------------------------------------------------------------------
# Action legality & in-kernel sampling
# ---------------------------------------------------------------------------


def _legal(s, a):
    """action_mask(st)[a] (full_env.action_mask)."""
    in_play = s["phase"] == int(Phase.PLAY)
    in_shop = s["phase"] == int(Phase.SHOP)
    in_blind = s["phase"] == int(Phase.BLIND_SELECT)
    any_sel = jnp.zeros((SUB, LANES), bool)
    for p in range(N_HAND):
        any_sel = any_sel | s["sel"][p]
    n_selectable = jnp.minimum(N_HAND, s["hn"])
    cost_a = jnp.zeros((SUB, LANES), i32)
    for r in range(N_SHOP):
        cost_a = jnp.where(a - Action.SHOP_BUY_BASE == r, s["sco"][r], cost_a)
    legal = in_play & (a == Action.PLAY_HAND) & any_sel
    legal = legal | (in_play & (a == Action.DISCARD) & any_sel & (s["dl"] > 0))
    legal = legal | (in_play & (a >= 2) & (a < 10) & ((a - 2) < n_selectable))
    legal = legal | (in_play & (a >= 10) & (a < 15) & ((a - 10) < s["cn"]))
    legal = legal | (in_shop & (a >= 20) & (a < 30) & ((a - 20) < s["sn"])
                     & (s["money"] >= cost_a))
    legal = legal | (in_shop & (a == 30) & (s["money"] >= s["rcost"]))
    legal = legal | (in_shop & (a == 31))
    legal = legal | (in_shop & (a >= 32) & (a < 37) & ((a - 32) < s["jn"]))
    legal = legal | (in_blind & (a >= 45) & (a < 49))
    return legal & ~s["done"]


def _sample_action(s):
    """Uniform over the legal set (hardware PRNG), matching mask-legal
    random stepping of the jnp engine distributionally."""
    zero = jnp.zeros((SUB, LANES), i32)
    any_sel = jnp.zeros((SUB, LANES), bool)
    for p in range(N_HAND):
        any_sel = any_sel | s["sel"][p]
    cp = any_sel.astype(i32)
    cd = (any_sel & (s["dl"] > 0)).astype(i32)
    ns = jnp.minimum(N_HAND, s["hn"])
    cu = s["cn"]
    play_T = cp + cd + ns + cu

    afford = []
    nb = zero
    for r in range(N_SHOP):
        f = (r < s["sn"]) & (s["money"] >= s["sco"][r])
        afford.append(f)
        nb = nb + f.astype(i32)
    rr = (s["money"] >= s["rcost"]).astype(i32)
    shop_T = nb + rr + 1 + s["jn"]
    blind_T = jnp.full((SUB, LANES), 4, i32)

    in_play = s["phase"] == int(Phase.PLAY)
    in_shop = s["phase"] == int(Phase.SHOP)
    in_blind = s["phase"] == int(Phase.BLIND_SELECT)
    T = jnp.where(in_play, play_T, jnp.where(in_shop, shop_T,
                                             jnp.where(in_blind, blind_T, 0)))
    u = _u01_hw(_bits_hw())
    t = jnp.minimum((u * T.astype(f32)).astype(i32), T - 1)

    a_play = jnp.where(
        t < cp, Action.PLAY_HAND,
        jnp.where(t < cp + cd, Action.DISCARD,
                  jnp.where(t < cp + cd + ns, 2 + (t - cp - cd),
                            10 + (t - cp - cd - ns))))
    a_buy = zero
    cum = zero
    for r in range(N_SHOP):
        a_buy = jnp.where(afford[r] & (cum == t), 20 + r, a_buy)
        cum = cum + afford[r].astype(i32)
    a_shop = jnp.where(
        t < nb, a_buy,
        jnp.where(t < nb + rr, Action.SHOP_REROLL,
                  jnp.where(t < nb + rr + 1, Action.SHOP_END,
                            32 + (t - nb - rr - 1))))
    a_blind = jnp.where(t < 3, 45 + t, Action.SKIP_BLIND)
    a = jnp.where(in_play, a_play, jnp.where(in_shop, a_shop,
                                             jnp.where(in_blind, a_blind, 59)))
    return jnp.where(T > 0, a, 59)


# ---------------------------------------------------------------------------
# Autoreset (full_env.reset + step_autoreset key folding)
# ---------------------------------------------------------------------------


def _batcher64(v):
    """In-register ascending Batcher odd-even merge sort of 64 i32 rows —
    543 compare-exchanges vs bitonic's 672 (same result: all real keys are
    distinct via their packed index payload, and the 12 pad sentinels are
    identical INT32_MAX words, so every sorting network produces the
    identical output)."""
    v = list(v)
    p = 1
    while p < 64:
        k = p
        while k >= 1:
            for j in range(k % p, 64 - k, 2 * k):
                for i in range(0, min(k, 64 - j - k)):
                    a, b = i + j, i + j + k
                    if a // (p * 2) == b // (p * 2):
                        lo = jnp.minimum(v[a], v[b])
                        hi = jnp.maximum(v[a], v[b])
                        v[a], v[b] = lo, hi
            k //= 2
        p *= 2
    return v


def _reset_updates(s, rng):
    """Fresh-episode state (full_env.reset). The deck shuffle is the fused
    path's B7-class deviation: priority-sort instead of
    jax.random.permutation (uniform up to 26-bit ties)."""
    zero = jnp.zeros((SUB, LANES), i32)
    false = jnp.zeros((SUB, LANES), bool)
    zu = jnp.zeros((SUB, LANES), u32)

    if rng.exact:
        nk1, nk2 = KR.fold_in(s["k1"], s["k2"],
                              _bitcast(s["sc"], u32))
        sk = KR.fold_in(nk1, nk2, jnp.full((SUB, LANES),
                                           _STREAM["deck_shuffle"], u32))
        dk = KR.fold_in(sk[0], sk[1], zu)
        prio = [KR.random_bits32(dk[0], dk[1],
                                 jnp.full((SUB, LANES), c, u32))
                for c in range(52)]
    else:
        nk1, nk2 = s["k1"], s["k2"]
        pb = _bitcast(pltpu.prng_random_bits((52, SUB, LANES)), u32)
        prio = [pb[c] for c in range(52)]

    # sort in the sign-flipped i32 domain (no unsigned min/max in Mosaic);
    # the flip touches only bit 31, so the packed low-6-bit payload
    # survives. The payload is the card's (suit<<4 | rank-2) directly — 52
    # distinct 6-bit words, so the sort is the same uniform permutation as
    # with an index payload, and the post-sort decode is 2 ops per channel
    # instead of the 13-ary div/mod staircase.
    vals = [_sortable((prio[c] & jnp.uint32(0xFFFFFFC0))
                      | jnp.uint32(((c // 13) << 4) | (c % 13)))
            for c in range(52)]
    vals += [jnp.full((SUB, LANES), 2 ** 31 - 1, i32) for _ in range(12)]
    svals = _batcher64(vals)

    rk = []
    su = []
    for d in range(N_DECK):
        if d < 52:
            rk.append((svals[d] & jnp.int32(15)) + 2)
            su.append((svals[d] >> 4) & jnp.int32(3))
        else:
            rk.append(zero)
            su.append(zero)

    ctr = [zu for _ in range(N_CTR)]
    ctr[_STREAM["deck_shuffle"]] = jnp.full((SUB, LANES), 1, u32)
    return {
        "rk": rk, "su": su,
        "en": [zero] * N_DECK, "edt": [zero] * N_DECK, "slc": [zero] * N_DECK,
        "al": [jnp.full((SUB, LANES), d < 52, bool) for d in range(N_DECK)],
        "ih_lo": zu, "ih_hi": zu,
        "hidx": [jnp.full((SUB, LANES), -1, i32)] * N_HAND,
        "hrk": [zero] * N_HAND, "hsu": [zero] * N_HAND, "hen": [zero] * N_HAND,
        "hed": [zero] * N_HAND, "hsl": [zero] * N_HAND,
        "hn": zero, "sel": [false] * N_HAND, "fd": [false] * N_HAND,
        "high": [false] * N_HAND,
        "jok": [zero] * N_JOK, "jn": zero,
        "green": jnp.full((SUB, LANES), 1, i32), "bus": zero,
        "cons": [zero] * N_CONS, "cn": zero, "vou": zero,
        "jslots": jnp.full((SUB, LANES), 5, i32),
        "cslots": jnp.full((SUB, LANES), 2, i32),
        "ante": jnp.full((SUB, LANES), 1, i32),
        "round": jnp.full((SUB, LANES), 1, i32),
        "phase": jnp.full((SUB, LANES), int(Phase.BLIND_SELECT), i32),
        "need": jnp.full((SUB, LANES), 300, i32),
        "career": zero, "rchips": zero, "best": zero,
        "money": jnp.full((SUB, LANES), 4, i32),
        "hl": jnp.full((SUB, LANES), 4, i32),
        "dl": jnp.full((SUB, LANES), 3, i32),
        "hsize": jnp.full((SUB, LANES), 8, i32),
        "lvl": [jnp.full((SUB, LANES), 1, i32)] * N_LVL, "pc": [zero] * N_LVL,
        "sty": [zero] * N_SHOP, "sit": [zero] * N_SHOP, "sco": [zero] * N_SHOP,
        "sn": zero, "rbase": jnp.full((SUB, LANES), SL.REROLL_BASE, i32),
        "rcost": jnp.full((SUB, LANES), 5, i32),
        "bact": false, "bid": jnp.full((SUB, LANES), -1, i32),
        "btypes": zero, "bfirst": jnp.ones((SUB, LANES), bool),
        "bverd": jnp.full((SUB, LANES), 5, i32),
        "bp_lo": zu, "bp_hi": zu,
        "hpt": zero, "hpa": zero, "jsold": zero,
        "k1": nk1, "k2": nk2, "ctr": ctr,
        "done": false, "sc": zero,
    }


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


# PROFILING-ONLY ablation switches (scripts/ablate_fused_full.py): comma
# list in $FF_ABLATE stubs whole stages of the step body at TRACE TIME to
# attribute kernel wall time. Read once at import; any non-empty value
# BREAKS env semantics — never set outside the ablation probe. To guard
# against a stray/inherited FF_ABLATE silently corrupting a training or
# benchmark process, it is honored ONLY when the ablation driver also sets
# FF_ABLATE_OK=1 (scripts/ablate_fused_full.py does); otherwise we raise.
import os as _os  # noqa: E402

_ABLATE = frozenset(x for x in _os.environ.get("FF_ABLATE", "").split(",") if x)
if _ABLATE and _os.environ.get("FF_ABLATE_OK") != "1":
    raise RuntimeError(
        "FF_ABLATE is set but FF_ABLATE_OK!=1 — FF_ABLATE stubs whole stages "
        "of the fused full-env kernel and corrupts rollout semantics. It is "
        "profiling-only; unset it (or run via scripts/ablate_fused_full.py).")


def _step(s, a, rng, pow115, pow15):
    """One full_env.step_autoreset, branch-free. Returns (s', reward, done)."""
    zero = jnp.zeros((SUB, LANES), i32)
    false = jnp.zeros((SUB, LANES), bool)

    over = (s["ante"] > 100) | (s["career"] > 1_000_000_000) | s["done"]
    legal = _legal(s, a)

    present = [jnp.full((SUB, LANES), p, i32) < s["hn"] for p in range(N_HAND)]
    view = (s["hrk"], s["hsu"], s["hen"], s["hed"], s["hsl"], present)

    in_play = s["phase"] == int(Phase.PLAY)
    in_shop = s["phase"] == int(Phase.SHOP)
    in_blind = s["phase"] == int(Phase.BLIND_SELECT)
    do_play = in_play & (a == Action.PLAY_HAND)
    do_disc = in_play & (a == Action.DISCARD)
    do_sel = in_play & (a >= 2) & (a < 10)
    do_use = in_play & (a >= 10) & (a < 15)
    do_buy = in_shop & (a >= 20) & (a < 30)
    do_rr = in_shop & (a == Action.SHOP_REROLL)
    do_end = in_shop & (a == Action.SHOP_END)
    do_sell = in_shop & (a >= 32) & (a < 37)
    do_bsel = in_blind & (a >= 45) & (a < 48)
    do_skip = in_blind & (a == Action.SKIP_BLIND)

    if "play" in _ABLATE:
        play_upd, r_play = {}, jnp.zeros((SUB, LANES), f32)
        beat, fail, boss_ok = false, false, ~false
        k_boss = rng.stream(s, "boss_abilities")[0] if rng.exact else (None,)
    else:
        play_upd, r_play, beat, fail, boss_ok, k_boss = _play_branch(
            s, rng, view)
    if "disc" in _ABLATE:
        disc_upd, r_disc = {}, jnp.zeros((SUB, LANES), f32)
        rem_disc = [false] * N_HAND
    else:
        disc_upd, r_disc, rem_disc = _discard_branch(s, rng, view)
    if "cons" in _ABLATE:
        cons_upd, r_use = {}, jnp.zeros((SUB, LANES), f32)
        rem_dc, dc_destroy = [false] * N_HAND, false
    else:
        cons_upd, r_use, rem_dc, dc_destroy = _consumable_branch(
            s, rng, view, a, do_use)
    pos = jnp.clip(a - Action.SELECT_CARD_BASE, 0, N_HAND - 1)
    toggled = [_sel(pos == p, ~s["sel"][p], s["sel"][p]) for p in range(N_HAND)]
    buy_upd, r_buy = _shop_buy_branch(s, a)
    sell_upd, r_sell = _sell_branch(s, a)
    bsel_upd, r_bsel = _blind_branch(s, rng, a, pow15)

    # ---- shared round advance + shop generation ----
    beat_play = do_play & boss_ok & beat
    adv_do = beat_play | do_skip
    adv_in = _msel(beat_play, play_upd, s)
    adv_ante = jnp.where(adv_in["round"] == 3, adv_in["ante"] + 1,
                         adv_in["ante"])
    k_gen, ctr_gen = rng.stream(s, "shop_generation")
    k_rr, ctr_rr = rng.stream(s, "shop_reroll")
    if rng.exact:
        gen_key = (jnp.where(do_rr, k_rr[0], k_gen[0]),
                   jnp.where(do_rr, k_rr[1], k_gen[1]))
    else:
        gen_key = None
    gen_ante = jnp.where(do_rr, s["ante"], adv_ante)
    if "shopgen" in _ABLATE:
        gen = ([zero] * N_SHOP, [zero] * N_SHOP, [zero] * N_SHOP, zero,
               jnp.ones((SUB, LANES), f32))
    else:
        gen = _shop_gen(s, rng, gen_key, gen_ante, pow115)
    mult = gen[4]

    adv_upd, _adv_over = _advance_branch(
        adv_in, gen, mult, jnp.ones((SUB, LANES), bool))

    # reroll (full_env._shop_reroll: counter advances even when unaffordable)
    rr_cost = _trunc(s["rbase"].astype(f32) * mult).astype(i32)
    afford = s["money"] >= rr_cost
    rr_upd = {
        "money": jnp.where(afford, s["money"] - rr_cost, s["money"]),
        "rbase": jnp.where(afford,
                           _trunc(s["rbase"].astype(f32)
                                  * SL.REROLL_GROWTH).astype(i32), s["rbase"]),
        "sty": [jnp.where(afford, gen[0][r], s["sty"][r]) for r in range(N_SHOP)],
        "sit": [jnp.where(afford, gen[1][r], s["sit"][r]) for r in range(N_SHOP)],
        "sco": [jnp.where(afford, gen[2][r], s["sco"][r]) for r in range(N_SHOP)],
        "sn": jnp.where(afford, gen[3], s["sn"]),
        "ctr": ctr_rr,
    }
    r_rr = jnp.where(afford, 0.0, -1.0)

    # ---- assemble (mutually exclusive predicates) ----
    reward = jnp.full((SUB, LANES), -1.0, f32)
    play_cont = do_play & boss_ok & ~beat & ~fail
    # The consumable branch's rows are self-gated by do_use (its cid is
    # voided elsewhere), so they BECOME the merge base for free; only its
    # unconditional selection-clear / stream-counter writes still select.
    base = s
    if "cons" not in _ABLATE:
        base = {**s, **{k: v for k, v in cons_upd.items()
                        if k not in ("sel", "ctr")}}
        base = _msel(do_use, {"sel": cons_upd["sel"],
                              "ctr": cons_upd["ctr"]}, base)
    nxt = _msel(play_cont, {**play_upd, "hl": s["hl"] - 1}, base)
    nxt = _msel(do_play & boss_ok & fail, play_upd, nxt)
    nxt = _msel(beat_play, play_upd, nxt)
    nxt = _msel(adv_do, adv_upd, nxt)
    reward = jnp.where(do_play, jnp.where(boss_ok, r_play, -1.0), reward)
    # Blocked play (#A39): the reference highlights BEFORE the boss
    # can_play check and returns early — the highlight sticks anyway.
    if "play" not in _ABLATE:
        nxt = _msel(do_play & ~boss_ok, {"high": play_upd["high"]}, nxt)
    term = do_play & boss_ok & fail
    nxt = _msel(do_disc, disc_upd, nxt)
    reward = jnp.where(do_disc, r_disc, reward)
    # Shared pre-draw hand compaction: ONE _remove_positions serves the
    # discard and consumable-destroy lanes (disjoint, both compact the
    # pre-step hand `s`).
    rem_shared = [(do_disc & rem_disc[p]) | rem_dc[p] for p in range(N_HAND)]
    nxt = _msel(do_disc | dc_destroy, _remove_positions(s, rem_shared), nxt)
    nxt = _msel(do_sel, {"sel": toggled}, nxt)
    reward = jnp.where(do_sel, 0.0, reward)
    reward = jnp.where(do_use, r_use, reward)
    nxt = _msel(do_buy, buy_upd, nxt)
    reward = jnp.where(do_buy, r_buy, reward)
    nxt = _msel(do_rr, rr_upd, nxt)
    reward = jnp.where(do_rr, r_rr, reward)
    nxt = _msel(do_sell, sell_upd, nxt)
    reward = jnp.where(do_sell, r_sell, reward)
    nxt = _msel(do_end, {"phase": jnp.full((SUB, LANES),
                                           int(Phase.PLAY), i32)}, nxt)
    reward = jnp.where(do_end, 0.0, reward)
    nxt = _msel(do_bsel, bsel_upd, nxt)
    reward = jnp.where(do_bsel, r_bsel, reward)
    reward = jnp.where(do_skip, -5.0, reward)

    # ---- shared refill draw ----
    draw_do = play_cont | do_disc | do_bsel | do_end
    if "draw" not in _ABLATE:
        nxt = {**nxt, **_draw_pass(nxt, draw_do)}

    # ---- boss on-hand-drawn for the refreshed hand (play continue) ----
    k_hook = k_wheel = None
    if rng.exact:
        k_hook, k_wheel = KR.split2(k_boss[0], k_boss[1])
    if "ohd" not in _ABLATE:
        present2 = [jnp.full((SUB, LANES), p, i32) < nxt["hn"] for p in range(N_HAND)]
        dis_h = jnp.full((SUB, LANES), _SORT_FLIP, i32)
        hkeys = []
        for p in range(N_HAND):
            b = (rng.bits(k_hook, p) if rng.exact else _bits_hw())
            hkeys.append(jnp.where(present2[p], _sortable(b), dis_h))
        picks = []
        for _ in range(2):
            best_k = dis_h
            best_p = zero
            for p in range(N_HAND):
                better = hkeys[p] > best_k
                best_k = jnp.maximum(hkeys[p], best_k)
                best_p = jnp.where(better, p, best_p)
            picks.append(best_p)
            hkeys = [jnp.where(best_p == p, dis_h, hkeys[p])
                     for p in range(N_HAND)]
        n_pres = zero
        for p in range(N_HAND):
            n_pres = n_pres + present2[p].astype(i32)
        hook = [((picks[0] == p) | (picks[1] == p)) & present2[p] & (n_pres >= 2)
                for p in range(N_HAND)]
        face = []
        for p in range(N_HAND):
            wroll = (rng.uniform(k_wheel, p) if rng.exact else _u01_hw(_bits_hw()))
            wheel = present2[p] & (wroll < 1.0 / 7.0)
            house = present2[p] & nxt["bfirst"]
            mark = present2[p] & (nxt["hrk"][p] >= 11) & (nxt["hrk"][p] <= 13)
            fish = present2[p] & ~nxt["bfirst"]
            f = _sel(nxt["bid"] == B.WHEEL, wheel,
                     _sel(nxt["bid"] == B.HOUSE, house,
                          _sel(nxt["bid"] == B.MARK, mark,
                               _sel(nxt["bid"] == B.FISH, fish, false))))
            face.append(f)
        gate_fd = play_cont & nxt["bact"]
        nxt["fd"] = [_sel(gate_fd, face[p], nxt["fd"][p]) for p in range(N_HAND)]
        hook_upd = _remove_positions(nxt, hook)
        nxt = _msel(gate_fd & (nxt["bid"] == B.HOOK), hook_upd, nxt)

    # ---- invalid-action / terminated-before-step freezes ----
    # Both freezes keep `s`, so one fused full-state select serves them
    # (where(over, s, where(legal, nxt, s)) == where(legal & ~over, nxt, s))
    # — the second full-state _msel was ~500 identity-or-freeze row selects.
    nxt = _msel(legal & ~over, nxt, s)
    reward = jnp.where(legal, reward, -1.0)
    term = term & legal
    reward = jnp.where(over, 0.0, reward)
    done = over | term
    nxt["done"] = done
    nxt["sc"] = s["sc"] + 1

    # ---- autoreset ----
    if "reset" not in _ABLATE:
        nxt = _msel(done, _reset_updates(nxt, rng), nxt)
    return nxt, reward, done


def _load_state(cards_ref, ints_ref, rng_ref):
    """Read the packed blocks (refs or [rows, 1, SUB, LANES] arrays) into the
    per-row state dict the step functions operate on."""
    zero = jnp.zeros((SUB, LANES), i32)

    s = {}
    s["rk"] = [cards_ref[CH_RANK * 64 + d, 0] for d in range(N_DECK)]
    s["su"] = [cards_ref[CH_SUIT * 64 + d, 0] for d in range(N_DECK)]
    s["en"] = [cards_ref[CH_ENH * 64 + d, 0] for d in range(N_DECK)]
    s["edt"] = [cards_ref[CH_ED * 64 + d, 0] for d in range(N_DECK)]
    s["slc"] = [cards_ref[CH_SEAL * 64 + d, 0] for d in range(N_DECK)]
    s["al"] = [cards_ref[CH_ALIVE * 64 + d, 0] != 0 for d in range(N_DECK)]

    def ri(r):
        return ints_ref[r, 0]

    s["hidx"] = [ri(R_HIDX + p) for p in range(N_HAND)]
    s["sel"] = [ri(R_SEL + p) != 0 for p in range(N_HAND)]
    s["fd"] = [ri(R_FD + p) != 0 for p in range(N_HAND)]
    s["high"] = [ri(R_HIGH + p) != 0 for p in range(N_HAND)]
    s["jok"] = [ri(R_JOK + j) for j in range(N_JOK)]
    s["cons"] = [ri(R_CONS + c5) for c5 in range(N_CONS)]
    s["sty"] = [ri(R_STY + r) for r in range(N_SHOP)]
    s["sit"] = [ri(R_SIT + r) for r in range(N_SHOP)]
    s["sco"] = [ri(R_SCO + r) for r in range(N_SHOP)]
    s["lvl"] = [ri(R_LVL + h) for h in range(N_LVL)]
    s["pc"] = [ri(R_PC + h) for h in range(N_LVL)]
    for name, row in (("hn", S_HN), ("jn", S_JN), ("green", S_GREEN),
                      ("bus", S_BUS), ("cn", S_CN), ("vou", S_VOU),
                      ("jslots", S_JSLOTS), ("cslots", S_CSLOTS),
                      ("ante", S_ANTE), ("round", S_ROUND), ("phase", S_PHASE),
                      ("need", S_NEED), ("career", S_CAREER),
                      ("rchips", S_RCHIPS), ("best", S_BEST),
                      ("money", S_MONEY), ("hl", S_HL), ("dl", S_DL),
                      ("hsize", S_HSIZE), ("sn", S_SN), ("rbase", S_RBASE),
                      ("rcost", S_RCOST), ("bid", S_BID), ("btypes", S_BTYPES),
                      ("bverd", S_BVERD), ("hpt", S_HPT), ("hpa", S_HPA),
                      ("jsold", S_JSOLD), ("sc", S_STEPC)):
        s[name] = ri(row)
    s["bact"] = ri(S_BACT) != 0
    s["bfirst"] = ri(S_BFIRST) != 0
    s["done"] = ri(S_DONE) != 0
    s["bp_lo"] = _bitcast(ri(S_BPLO), u32)
    s["bp_hi"] = _bitcast(ri(S_BPHI), u32)
    s["k1"] = rng_ref[0, 0]
    s["k2"] = rng_ref[1, 0]
    s["ctr"] = [rng_ref[2 + k, 0] for k in range(N_CTR)]

    # Materialize hand channels from deck channels + hand_idx (once).
    for key_h, key_d in (("hrk", "rk"), ("hsu", "su"), ("hen", "en"),
                         ("hed", "edt"), ("hsl", "slc")):
        s[key_h] = [zero for _ in range(N_HAND)]
    for p in range(N_HAND):
        present = (jnp.full((SUB, LANES), p, i32) < s["hn"]) & (s["hidx"][p] >= 0)
        for d in range(N_DECK):
            m = present & (s["hidx"][p] == d)
            s["hrk"][p] = jnp.where(m, s["rk"][d], s["hrk"][p])
            s["hsu"][p] = jnp.where(m, s["su"][d], s["hsu"][p])
            s["hen"][p] = jnp.where(m, s["en"][d], s["hen"][p])
            s["hed"][p] = jnp.where(m, s["edt"][d], s["hed"][p])
            s["hsl"][p] = jnp.where(m, s["slc"][d], s["hsl"][p])
    gates = [(jnp.full((SUB, LANES), p, i32) < s["hn"]) for p in range(N_HAND)]
    s["ih_lo"], s["ih_hi"] = _slot_bits(s["hidx"], gates)
    return s


# State-dict keys holding bool rows. Mosaic cannot carry vector<8x128xi1>
# values through an scf.for loop ("failed to legalize operation 'scf.for'"),
# so the fori_loop carry packs these to i32 and re-expands inside the body.
_BOOL_KEYS = ("sel", "fd", "high", "al", "bact", "bfirst", "done")


def _carry_pack(s):
    out = dict(s)
    for k in _BOOL_KEYS:
        v = s[k]
        out[k] = [x.astype(i32) for x in v] if isinstance(v, list) else v.astype(i32)
    return out


def _carry_unpack(s):
    out = dict(s)
    for k in _BOOL_KEYS:
        v = s[k]
        out[k] = [x != 0 for x in v] if isinstance(v, list) else v != 0
    return out


def _run_loop(s, actions_ref, n_steps, use_actions, rng, pow115, pow15):
    """fori_loop of _step over the state dict; returns (s, tot, epi)."""
    zero = jnp.zeros((SUB, LANES), i32)

    def body(t, carry):
        st, tot, epi = carry
        if use_actions:
            a = actions_ref[t, 0]
        else:
            a = _sample_action(st)
        st2, reward, done = _step(_carry_unpack(st), a, rng, pow115, pow15)
        return _carry_pack(st2), tot + reward, epi + done.astype(i32)

    out, tot, epi = jax.lax.fori_loop(
        0, n_steps, body,
        (_carry_pack(s), jnp.zeros((SUB, LANES), f32), zero))
    return _carry_unpack(out), tot, epi


def _kernel(cards_ref, ints_ref, rng_ref, seed_ref, actions_ref,
            cards_out, ints_out, rng_out, reward_out, epi_out,
            *, n_steps: int, use_actions: bool, pow115, pow15):
    exact = use_actions
    if not exact:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    rng = _Rng(exact)
    s = _load_state(cards_ref, ints_ref, rng_ref)
    s, tot, epi = _run_loop(s, actions_ref, n_steps, use_actions, rng,
                            pow115, pow15)

    # ---- pack out ----
    cards_rows, ints_rows, rng_rows = _store_rows(s)
    for r, v in enumerate(cards_rows):
        cards_out[r, 0] = v
    for r, v in enumerate(ints_rows):
        ints_out[r, 0] = v
    for r, v in enumerate(rng_rows):
        rng_out[r, 0] = v
    reward_out[0, 0] = tot
    epi_out[0, 0] = epi


def _store_rows(s):
    """State dict -> packed row lists (cards[384], ints[NI], rng[NR])."""
    cards_rows = [None] * (6 * N_DECK)
    for d in range(N_DECK):
        cards_rows[CH_RANK * 64 + d] = s["rk"][d]
        cards_rows[CH_SUIT * 64 + d] = s["su"][d]
        cards_rows[CH_ENH * 64 + d] = s["en"][d]
        cards_rows[CH_ED * 64 + d] = s["edt"][d]
        cards_rows[CH_SEAL * 64 + d] = s["slc"][d]
        cards_rows[CH_ALIVE * 64 + d] = s["al"][d].astype(i32)
    ints_rows = [None] * NI
    for p in range(N_HAND):
        ints_rows[R_HIDX + p] = s["hidx"][p]
        ints_rows[R_SEL + p] = s["sel"][p].astype(i32)
        ints_rows[R_FD + p] = s["fd"][p].astype(i32)
        ints_rows[R_HIGH + p] = s["high"][p].astype(i32)
    ints_rows[R_HIDX + 8] = jnp.full((SUB, LANES), -1, i32)
    ints_rows[R_HIDX + 9] = jnp.full((SUB, LANES), -1, i32)
    for j in range(N_JOK):
        ints_rows[R_JOK + j] = s["jok"][j]
    for c5 in range(N_CONS):
        ints_rows[R_CONS + c5] = s["cons"][c5]
    for r in range(N_SHOP):
        ints_rows[R_STY + r] = s["sty"][r]
        ints_rows[R_SIT + r] = s["sit"][r]
        ints_rows[R_SCO + r] = s["sco"][r]
    for h in range(N_LVL):
        ints_rows[R_LVL + h] = s["lvl"][h]
        ints_rows[R_PC + h] = s["pc"][h]
    for name, row in (("hn", S_HN), ("jn", S_JN), ("green", S_GREEN),
                      ("bus", S_BUS), ("cn", S_CN), ("vou", S_VOU),
                      ("jslots", S_JSLOTS), ("cslots", S_CSLOTS),
                      ("ante", S_ANTE), ("round", S_ROUND), ("phase", S_PHASE),
                      ("need", S_NEED), ("career", S_CAREER),
                      ("rchips", S_RCHIPS), ("best", S_BEST),
                      ("money", S_MONEY), ("hl", S_HL), ("dl", S_DL),
                      ("hsize", S_HSIZE), ("sn", S_SN), ("rbase", S_RBASE),
                      ("rcost", S_RCOST), ("bid", S_BID), ("btypes", S_BTYPES),
                      ("bverd", S_BVERD), ("hpt", S_HPT), ("hpa", S_HPA),
                      ("jsold", S_JSOLD), ("sc", S_STEPC)):
        ints_rows[row] = s[name]
    ints_rows[S_BACT] = s["bact"].astype(i32)
    ints_rows[S_BFIRST] = s["bfirst"].astype(i32)
    ints_rows[S_DONE] = s["done"].astype(i32)
    ints_rows[S_BPLO] = _bitcast(s["bp_lo"], i32)
    ints_rows[S_BPHI] = _bitcast(s["bp_hi"], i32)
    rng_rows = [s["k1"], s["k2"]] + [s["ctr"][k] for k in range(N_CTR)]
    return cards_rows, ints_rows, rng_rows


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _pow_tables_cached():
    return _pow_tables()


@functools.partial(jax.jit, static_argnames=("n_envs", "n_steps",
                                             "use_actions", "interpret"))
def _rollout(st0, seed, actions, n_envs: int, n_steps: int,
             use_actions: bool, interpret: bool):
    packed = pack_full_state(st0)
    n_tiles = n_envs // TILE
    pow115, pow15 = _pow_tables_cached()

    def tile(x):
        return x.reshape(x.shape[0], n_tiles, SUB, LANES)

    if use_actions:
        acts = tile(jnp.asarray(actions, i32).reshape(n_steps, n_envs))
        a_rows = n_steps
    else:
        acts = jnp.zeros((1, n_tiles, SUB, LANES), i32)
        a_rows = 1

    def blk(rows):
        return pl.BlockSpec((rows, 1, SUB, LANES), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    n_cards = 6 * N_DECK
    cards, ints, rng, reward, epi = pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps, use_actions=use_actions,
                          pow115=tuple(pow115), pow15=tuple(pow15)),
        grid=(n_tiles,),
        in_specs=[blk(n_cards), blk(NI), blk(NR),
                  pl.BlockSpec(memory_space=pltpu.SMEM), blk(a_rows)],
        out_specs=(blk(n_cards), blk(NI), blk(NR), blk(1), blk(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_cards, n_tiles, SUB, LANES), i32),
            jax.ShapeDtypeStruct((NI, n_tiles, SUB, LANES), i32),
            jax.ShapeDtypeStruct((NR, n_tiles, SUB, LANES), u32),
            jax.ShapeDtypeStruct((1, n_tiles, SUB, LANES), f32),
            jax.ShapeDtypeStruct((1, n_tiles, SUB, LANES), i32),
        ),
        # The step body keeps ~17.5 MB of live vectors on the Mosaic stack
        # (526 state rows + temporaries across the scf.for step loop), just
        # over the 16 MB default scoped-vmem cap — raise it; v5e has 128 MB
        # VMEM/core and the in/out blocks only use ~4.5 MB of it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tile(packed["cards"].reshape(n_cards, n_envs)), tile(packed["ints"]),
      tile(packed["rng"]), jnp.asarray(seed, i32).reshape(1, 1), acts)

    def untile(x):
        return x.reshape(x.shape[0], n_envs)

    out_packed = {"cards": untile(cards).reshape(6, N_DECK, n_envs),
                  "ints": untile(ints), "rng": untile(rng)}
    state = unpack_full_state(out_packed)
    return state, untile(reward)[0], untile(epi)[0]


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _rows_jit(cards, ints, rngp, actions, n_steps: int):
    pow115, pow15 = _pow_tables_cached()
    rng = _Rng(True)
    s = _load_state(cards, ints, rngp)
    s, tot, epi = _run_loop(s, actions, n_steps, True, rng,
                            tuple(pow115), tuple(pow15))
    cr, ir, rr = _store_rows(s)
    return (jnp.stack(cr)[:, None], jnp.stack(ir)[:, None],
            jnp.stack(rr)[:, None], tot, epi)


def rollout_full_rows(st0, actions, n_steps: int):
    """Validation harness: the kernel's exact arithmetic (fed-actions mode)
    compiled as plain XLA ops — no pallas_call, no Mosaic, no interpret
    machinery. Bitwise the same program as the kernel's fed mode; used to
    iterate on kernel-vs-jnp-engine parity quickly on CPU.

    st0: batched FullEnvState over n_envs (multiple of TILE).
    actions: [n_steps, n_envs] i32.
    """
    packed = pack_full_state(st0)
    n_envs = packed["ints"].shape[-1]
    assert n_envs % TILE == 0
    n_tiles = n_envs // TILE
    _pow_tables_cached()
    acts = jnp.asarray(actions, i32).reshape(n_steps, n_tiles, SUB, LANES)
    cards = packed["cards"].reshape(6 * N_DECK, n_tiles, SUB, LANES)
    ints = packed["ints"].reshape(NI, n_tiles, SUB, LANES)
    rngp = packed["rng"].reshape(NR, n_tiles, SUB, LANES)
    outs = []
    for tix in range(n_tiles):
        outs.append(_rows_jit(cards[:, tix:tix + 1], ints[:, tix:tix + 1],
                              rngp[:, tix:tix + 1],
                              acts[:, tix:tix + 1], n_steps))

    def untile(k):
        # n_tiles × [rows, 1, SUB, LANES] -> [rows, n_envs] (same env
        # ordering as _rollout's untile: tile-major, then sublane, lane).
        x = jnp.concatenate([o[k] for o in outs], axis=1)
        return x.reshape(x.shape[0], n_envs)

    cards_o = untile(0).reshape(6, N_DECK, n_envs)
    ints_o = untile(1)
    rng_o = untile(2)
    state = unpack_full_state({"cards": cards_o, "ints": ints_o,
                               "rng": rng_o})
    tot = jnp.concatenate([o[3].reshape(TILE) for o in outs])
    epi = jnp.concatenate([o[4].reshape(TILE) for o in outs])
    return {"state": state, "total_reward": tot, "episodes": epi}


@functools.partial(jax.jit, static_argnames=("n_envs",))
def _default_reset(seed, n_envs: int):
    from balatro_gym_tpu.engine import full_env

    keys = jax.random.split(jax.random.key(seed), n_envs)
    return jax.vmap(full_env.reset)(keys)


def rollout_full_fused(seed, n_envs: int, n_steps: int, *, actions=None,
                       init_state=None, interpret: bool = False):
    """Fused-kernel flagship-env rollout.

    Args:
        seed: hardware-PRNG seed (sampling mode); ignored in fed mode.
        n_envs: multiple of TILE (=1024).
        n_steps: rollout length.
        actions: optional [n_steps, n_envs] (or [n_steps], broadcast) action
            ids for deterministic replay with EXACT named-stream RNG —
            bit-identical to engine/full_env.step (f32 mode) until each
            env's first autoreset. None = in-kernel uniform-legal sampling
            via the TPU PRNG.
        init_state: optional batched FullEnvState to start from (defaults to
            ``vmap(full_env.reset)`` over ``split(key(seed), n_envs)``).

    Returns dict: ``state`` (final batched FullEnvState), ``total_reward``
    [n_envs] f32, ``episodes`` [n_envs] i32.
    """
    assert n_envs % TILE == 0, f"n_envs={n_envs} must be a multiple of {TILE}"
    _pow_tables_cached()  # mint outside any trace
    use_actions = actions is not None
    if use_actions:
        actions = jnp.asarray(actions, i32)
        if actions.ndim == 1:
            actions = jnp.broadcast_to(actions[:, None],
                                       (actions.shape[0], n_envs))
    else:
        actions = jnp.zeros((1, n_envs), i32)
    if init_state is None:
        init_state = _default_reset(seed, n_envs)
    state, tot, epi = _rollout(init_state, seed, actions, n_envs, n_steps,
                               use_actions, interpret)
    return {"state": state, "total_reward": tot, "episodes": epi}

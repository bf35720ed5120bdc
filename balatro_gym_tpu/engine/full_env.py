"""The flagship full-game environment — Discrete(60), all phases, TPU-native.

Rebuild of ``BalatroEnv`` (reference: balatro_gym/balatro_env_2.py:354-1888):
the whole game — blind select, play/discard with the UnifiedScorer pipeline,
shop economy, jokers, enhancements/editions/seals, ante progression, and the
8-component shaped reward — as ONE fixed-shape pytree + pure jitted ``step``
with a ``lax.switch`` over phases. ``vmap(step)`` runs tens of thousands of
envs in lockstep per chip.

Bug-faithful reference quirks that ARE the observable contract (each cited):

* Playing a hand does NOT remove cards from the hand: ``_step_play`` never
  unhighlights/removes, and ``_draw_cards`` only tops up
  (balatro_env_2.py:926-933, balatro_game.py:95-109) — so the hand set only
  changes via discards (which re-draw the lowest "available" deck indices —
  usually the very cards just discarded, balatro_game.py:98-109).
* BLIND_SELECT occurs exactly once per episode: beating a blind goes
  play→shop→play (balatro_env_2.py:1247-1251,1380), so ``chips_needed`` stays
  at the initially selected blind forever while antes advance.
* Lucky-card +20 mult is accumulated into a ``final_mult`` that is never
  applied (balatro_env_2.py:722,738); only the $20 money roll lands.
* Glass break rolls the RNG but the destroy loop is ``pass``
  (balatro_env_2.py:770-772) — glass cards are never destroyed.
* Joker money earned during scoring is written into a throwaway dict
  (balatro_env_2.py:688) and lost.
* Shop card/pack purchases append to a PlayerState.deck that is never synced
  back — cards vanish; only money/jokers/vouchers persist
  (balatro_env_2.py:1225-1244).
* The shop reroll action-mask cost is synced only at shop generation, so it
  goes stale after rerolls (balatro_env_2.py:1392,1455).
* ``_advance_round`` money is ``25*round + (10 if round==3)`` with the NEW
  round number (balatro_env_2.py:1372).

RNG: named streams over jax.random (core.rng). Draw-count parity with
CPython's Mersenne streams is impossible and not required; within this
engine, same seed ⇒ bit-identical trajectories.

See PARITY.md for the complete quirk/deviation ledger.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core import pow_tables as PT
from balatro_gym_tpu.core import rng as R
from balatro_gym_tpu.core.constants import (
    Action,
    BASE_HAND_CHIPS,
    BASE_HAND_MULT,
    HandType,
    NUM_HAND_TYPES,
    Phase,
    get_blind_chips,
)
from balatro_gym_tpu.engine import consumable_logic as CL
from balatro_gym_tpu.engine import shop_logic as SL
from balatro_gym_tpu.ops import boss as B
from balatro_gym_tpu.ops import joker_tables as JT
from balatro_gym_tpu.ops.hand_eval import classify_env
from balatro_gym_tpu.ops.scoring import score_env_unified

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)
_F64 = jax.dtypes.canonicalize_dtype(jnp.float64)

MAX_DECK = 64     # 52 base + growth slots (spectral creation, later)
MAX_HAND = 10     # hand_size 8 default; boss/consumables can shift it
SEL = 8           # selection actions cover hand positions 0-7
MAX_JOKERS = 5
MAX_CONS = 5      # obs exposes 5 consumable slots (slots default 2)
NA = Action.ACTION_SPACE_SIZE

# Parity float dtype: f64 under the x64 test config, f32 in production.
# Resolved ONCE at import via canonicalize_dtype — unlike a bare
# float64 literal, this emits no 'requested dtype' UserWarning per
# call site under f32 runtimes (bench/dryrun artifact hygiene).
_F = jax.dtypes.canonicalize_dtype(jnp.float64)


@struct.dataclass
class FullEnvState:
    # Per-card channels, indexed by deck slot (card identity = slot).
    card_rank: jnp.ndarray   # [64] i32 (2..14; 0 = slot unused)
    card_suit: jnp.ndarray   # [64] i32
    card_enh: jnp.ndarray    # [64] i32
    card_ed: jnp.ndarray     # [64] i32
    card_seal: jnp.ndarray   # [64] i32
    card_alive: jnp.ndarray  # [64] bool
    # Hand / selection.
    hand_idx: jnp.ndarray    # [10] i32 deck slots, -1 empty
    hand_n: jnp.ndarray      # i32
    selected: jnp.ndarray    # [8] bool
    face_down: jnp.ndarray   # [8] bool
    # game.highlighted_indexes as a position mask: every played selection
    # accumulates here and ONLY discard_hand clears it (balatro_game.py:30-33,
    # 111-127; play_hand is never called so nothing else clears). Drives the
    # bug-faithful union-discard and deck-slot classification (#A39/#A40).
    highlighted: jnp.ndarray  # [8] bool
    # Collections.
    jokers: jnp.ndarray      # [5] i32 ids, 0 empty
    joker_n: jnp.ndarray     # i32
    green_mult: jnp.ndarray  # i32 Green Joker counter (score-neutral, checkpointed)
    bus_mult: jnp.ndarray    # i32 Ride the Bus counter
    cons: jnp.ndarray        # [5] i32 consumable obs-ids, 0 empty
    cons_n: jnp.ndarray      # i32
    vouchers: jnp.ndarray    # u32 bitset
    joker_slots: jnp.ndarray  # i32 (5)
    cons_slots: jnp.ndarray   # i32 (2)
    # Progression.
    ante: jnp.ndarray        # i32
    round: jnp.ndarray       # i32 1..3
    phase: jnp.ndarray       # i32
    chips_needed: jnp.ndarray       # i64
    chips_scored: jnp.ndarray       # i64 career total
    round_chips_scored: jnp.ndarray  # i64
    money: jnp.ndarray       # i32
    hands_left: jnp.ndarray  # i32
    discards_left: jnp.ndarray  # i32
    hand_size: jnp.ndarray   # i32
    # Score engine state.
    hand_levels: jnp.ndarray       # [12] i32
    hand_play_counts: jnp.ndarray  # [12] i32
    # Shop.
    shop_type: jnp.ndarray   # [10] i32
    shop_item: jnp.ndarray   # [10] i32
    shop_cost: jnp.ndarray   # [10] i32
    shop_n: jnp.ndarray      # i32
    reroll_base: jnp.ndarray       # i32 (grows ×1.35 within a shop)
    shop_reroll_cost: jnp.ndarray  # i32 displayed/mask cost (stale after reroll)
    # Boss blind.
    boss_active: jnp.ndarray  # bool
    boss_id: jnp.ndarray      # i32 (-1 none; ids 1..28)
    boss_played_types: jnp.ndarray  # u32 bitset of hand types scored this round
    boss_first_hand: jnp.ndarray    # bool
    boss_verdant_req: jnp.ndarray   # i32 (The Verdant: 5→7)
    boss_played_slots: jnp.ndarray  # [64] bool deck slots played this round (The Pillar)
    # Stats.
    hands_played_total: jnp.ndarray  # i32
    hands_played_ante: jnp.ndarray   # i32
    best_hand_this_ante: jnp.ndarray  # i64
    jokers_sold: jnp.ndarray         # i32
    # RNG + lifecycle.
    key: jnp.ndarray          # master PRNG key
    rng_counters: jnp.ndarray  # [16] u32 per-stream draw counters
    done: jnp.ndarray         # bool
    step_count: jnp.ndarray   # i32


def _stream(st: FullEnvState, name: str):
    """Draw the next key for a named stream; returns (key, new_state)."""
    key, counters = R.next_key(st.key, st.rng_counters, name)
    return key, st.replace(rng_counters=counters)


# ---------------------------------------------------------------------------
# Reset
# ---------------------------------------------------------------------------


def reset(key) -> FullEnvState:
    """Fresh episode: shuffled 52-card deck, phase=BLIND_SELECT, money 4
    (balatro_env_2.py:505-558 + UnifiedGameState defaults :165-190)."""
    counters = R.init_counters()
    shuffle_key = jax.random.fold_in(R.stream_key(key, "deck_shuffle"), 0)
    counters = counters.at[R.STREAM_ID["deck_shuffle"]].add(1)

    base_rank, base_suit = C.standard_deck_arrays()
    perm = jax.random.permutation(shuffle_key, 52)
    rank = jnp.zeros(MAX_DECK, jnp.int32).at[:52].set(jnp.asarray(base_rank, jnp.int32)[perm])
    suit = jnp.zeros(MAX_DECK, jnp.int32).at[:52].set(jnp.asarray(base_suit, jnp.int32)[perm])
    alive = jnp.zeros(MAX_DECK, bool).at[:52].set(True)

    zero64 = jnp.zeros(MAX_DECK, jnp.int32)
    return FullEnvState(
        card_rank=rank, card_suit=suit, card_enh=zero64, card_ed=zero64,
        card_seal=zero64, card_alive=alive,
        hand_idx=jnp.full(MAX_HAND, -1, jnp.int32), hand_n=jnp.int32(0),
        selected=jnp.zeros(SEL, bool), face_down=jnp.zeros(SEL, bool),
        highlighted=jnp.zeros(SEL, bool),
        jokers=jnp.zeros(MAX_JOKERS, jnp.int32), joker_n=jnp.int32(0),
        green_mult=jnp.int32(1), bus_mult=jnp.int32(0),
        cons=jnp.zeros(MAX_CONS, jnp.int32), cons_n=jnp.int32(0),
        vouchers=jnp.uint32(0),
        joker_slots=jnp.int32(5), cons_slots=jnp.int32(2),
        ante=jnp.int32(1), round=jnp.int32(1),
        phase=jnp.int32(Phase.BLIND_SELECT),
        chips_needed=jnp.asarray(300, _I64), chips_scored=jnp.asarray(0, _I64),
        round_chips_scored=jnp.asarray(0, _I64), money=jnp.int32(4),
        hands_left=jnp.int32(4), discards_left=jnp.int32(3),
        hand_size=jnp.int32(8),
        hand_levels=jnp.ones(NUM_HAND_TYPES, jnp.int32),
        hand_play_counts=jnp.zeros(NUM_HAND_TYPES, jnp.int32),
        shop_type=jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
        shop_item=jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
        shop_cost=jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
        shop_n=jnp.int32(0),
        reroll_base=jnp.int32(SL.REROLL_BASE),
        shop_reroll_cost=jnp.int32(5),  # UnifiedGameState default :196
        boss_active=jnp.zeros((), bool), boss_id=jnp.int32(-1),
        boss_played_types=jnp.uint32(0), boss_first_hand=jnp.ones((), bool),
        boss_verdant_req=jnp.int32(5),
        boss_played_slots=jnp.zeros(MAX_DECK, bool),
        hands_played_total=jnp.int32(0), hands_played_ante=jnp.int32(0),
        best_hand_this_ante=jnp.asarray(0, _I64), jokers_sold=jnp.int32(0),
        key=key, rng_counters=counters,
        done=jnp.zeros((), bool), step_count=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Draw / hand plumbing
# ---------------------------------------------------------------------------


def _hand_onehot(st: FullEnvState):
    """[10, 64] f32 one-hot of hand slots (zero rows for empty positions).

    Every hand<->deck data movement routes through this matrix as small
    matmuls — data-dependent gathers/scatters serialize on TPU (see
    CLAUDE.md perf rules).
    """
    return ((st.hand_idx[:, None] == jnp.arange(MAX_DECK))
            & (st.hand_idx >= 0)[:, None]).astype(jnp.float32)


def _in_hand_mask(st: FullEnvState):
    """[64] bool: deck slot currently held in hand."""
    held = (jnp.arange(MAX_HAND) < st.hand_n).astype(jnp.float32)
    return (held @ _hand_onehot(st)) > 0


def _draw_cards(st: FullEnvState) -> FullEnvState:
    """Top up the hand with the lowest 'available' deck slots, ascending —
    mirrors BalatroGame._draw_cards (balatro_game.py:95-109)."""
    avail = st.card_alive & ~_in_hand_mask(st)
    need = jnp.clip(st.hand_size - st.hand_n, 0, MAX_HAND)
    cum = jnp.cumsum(avail.astype(jnp.int32))
    chosen = avail & (cum <= need)
    n_drawn = jnp.sum(chosen).astype(jnp.int32)
    # Place chosen slots (ascending) at hand positions hand_n + (cum-1),
    # via a [64,10] placement one-hot instead of a scatter.
    pos = jnp.where(chosen, st.hand_n + cum - 1, MAX_HAND)
    P = (pos[:, None] == jnp.arange(MAX_HAND)).astype(jnp.float32)  # [64,10]
    new_vals = (jnp.arange(MAX_DECK, dtype=jnp.float32) @ P).astype(jnp.int32)
    filled = (chosen.astype(jnp.float32) @ P) > 0
    return st.replace(hand_idx=jnp.where(filled, new_vals, st.hand_idx),
                      hand_n=st.hand_n + n_drawn)


def _remove_hand_positions(st: FullEnvState, remove) -> FullEnvState:
    """Remove hand positions by [10] mask (list.remove semantics: order of
    the remainder preserved, balatro_game.py:117-120)."""
    slots = jnp.arange(MAX_HAND)
    keep = (slots < st.hand_n) & ~remove
    # Stable compaction: kept card i moves to (#kept before i) — one-hot
    # placement matmul, no sort/scatter.
    dest = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, MAX_HAND)
    D = (dest[:, None] == slots).astype(jnp.float32)  # [10,10]
    new_n = jnp.sum(keep).astype(jnp.int32)
    moved = (st.hand_idx.astype(jnp.float32) @ D).astype(jnp.int32)
    return st.replace(
        hand_idx=jnp.where(slots < new_n, moved, -1),
        hand_n=new_n,
    )


def _hand_card_view(st: FullEnvState):
    """Gather per-card channels for the 8 selectable hand positions.

    Returns (ranks, suits, enh, ed, seal, present) — [8] each; absent
    positions zeroed.
    """
    H = _hand_onehot(st)[:SEL]  # [8,64]
    present = (jnp.arange(SEL) < st.hand_n) & (st.hand_idx[:SEL] >= 0)
    z = lambda a: (H @ a.astype(jnp.float32)).astype(jnp.int32)
    return (z(st.card_rank), z(st.card_suit), z(st.card_enh),
            z(st.card_ed), z(st.card_seal), present)


# ---------------------------------------------------------------------------
# Round advancement (balatro_env_2.py:1326-1392)
# ---------------------------------------------------------------------------

# Blue-seal planet consumable obs-id per hand type (PLANET_HAND inverse;
# consumable id map balatro_env_2.py:1557-1559: Mercury=30..Eris=41).
_PLANET_OBS_OF_HAND = np.zeros(NUM_HAND_TYPES, np.int32)
for _p, _h in enumerate([HandType.ONE_PAIR, HandType.TWO_PAIR, HandType.THREE_KIND,
                         HandType.STRAIGHT, HandType.FLUSH, HandType.FULL_HOUSE,
                         HandType.FOUR_KIND, HandType.STRAIGHT_FLUSH, HandType.HIGH_CARD,
                         HandType.FIVE_KIND, HandType.FLUSH_HOUSE, HandType.FLUSH_FIVE]):
    _PLANET_OBS_OF_HAND[_h] = 30 + _p
PLANET_OBS_OF_HAND = jnp.asarray(_PLANET_OBS_OF_HAND)


def _generate_shop(st: FullEnvState) -> FullEnvState:
    k, st = _stream(st, "shop_generation")
    types, items, costs, n = SL.generate_inventory(k, st.ante, st.jokers, st.vouchers)
    return st.replace(
        shop_type=types, shop_item=items, shop_cost=costs, shop_n=n,
        reroll_base=jnp.int32(SL.REROLL_BASE),
        shop_reroll_cost=SL.displayed_reroll_cost(st.ante, st.vouchers),
    )


def _advance_round(st: FullEnvState) -> FullEnvState:
    """Beat/skip a blind: gold-card money, boss payout, ante/round++, round
    money, reset hands/discards, phase=SHOP + new inventory."""
    # Gold cards held in hand: +$3 each (balatro_env_2.py:1337-1343).
    H10 = _hand_onehot(st)
    held = (jnp.arange(MAX_HAND) < st.hand_n).astype(jnp.float32)
    gold_slots = (st.card_enh == C.Enhancement.GOLD).astype(jnp.float32)
    gold = ((held * (H10 @ gold_slots)).sum()).astype(jnp.int32)
    money = st.money + gold * C.GOLD_CARD_MONEY

    # Boss payout + deactivate (balatro_env_2.py:1346-1352).
    money = money + jnp.where(
        st.boss_active, B.BOSS_MONEY_REWARD[jnp.clip(st.boss_id, 0, 28)], 0)

    new_ante = jnp.where(st.round == 3, st.ante + 1, st.ante)
    new_round = jnp.where(st.round == 3, 1, st.round + 1)
    # Past ante 100 the reference returns right after the increment
    # (balatro_env_2.py:1364-1367): no round money, no hands reset, no shop,
    # phase unchanged.
    over = new_ante > 100
    money = money + jnp.where(over, 0,
                              25 * new_round + jnp.where(new_round == 3, 10, 0))

    st_base = st.replace(
        money=money, ante=new_ante, round=new_round,
        round_chips_scored=jnp.asarray(0, _I64),
        best_hand_this_ante=jnp.asarray(0, _I64), hands_played_ante=jnp.int32(0),
        boss_active=jnp.zeros((), bool), boss_id=jnp.int32(-1),
        boss_played_types=jnp.uint32(0), boss_first_hand=jnp.ones((), bool),
        boss_verdant_req=jnp.int32(5),
        boss_played_slots=jnp.zeros(MAX_DECK, bool),
        face_down=jnp.zeros(SEL, bool),
    )
    advanced = _generate_shop(st_base.replace(
        hands_left=jnp.int32(4), discards_left=jnp.int32(3),
        phase=jnp.int32(Phase.SHOP)))
    return jax.tree.map(lambda a, b: jnp.where(over, a, b), st_base, advanced)


# ---------------------------------------------------------------------------
# Play phase (balatro_env_2.py:639-1064)
# ---------------------------------------------------------------------------

# Reward shaping tables (balatro_env_2.py:824-835).
_HAND_QUALITY = np.zeros(NUM_HAND_TYPES, np.float64)
for _h, _v in [(HandType.HIGH_CARD, 0.1), (HandType.ONE_PAIR, 0.5),
               (HandType.TWO_PAIR, 1.0), (HandType.THREE_KIND, 2.0),
               (HandType.STRAIGHT, 2.5), (HandType.FLUSH, 2.5),
               (HandType.FULL_HOUSE, 3.5), (HandType.FOUR_KIND, 5.0),
               (HandType.STRAIGHT_FLUSH, 7.0), (HandType.FIVE_KIND, 10.0)]:
    _HAND_QUALITY[_h] = _v
HAND_QUALITY = jnp.asarray(_HAND_QUALITY)

# Synergy joker sets (balatro_env_2.py:853-863). Business Card / Smeared
# Joker: resolve by library name → id.
_FLUSH_SYN = (JT.J_FOUR_FINGERS, JT.J_SHORTCUT, 113)    # Smeared Joker id 113
_PAIR_SYN = (JT.J_ODD_TODD, JT.J_EVEN_STEVEN, JT.J_JOLLY, JT.J_ZANY)
_FACE_SYN = (JT.J_SCARY_FACE, JT.J_SMILEY_FACE, 42)     # Business Card id 42


def _has_any_joker(jokers, ids):
    m = jnp.zeros((), bool)
    for i in ids:
        m = m | jnp.any(jokers == i)
    return m


def _play_rolls(k_eff):
    """[8,3] per-hand-position uniforms for _play_hand (glass / lucky-mult /
    lucky-money). Module-level seam: the reference-differential test
    (tests/test_reference_differential.py) monkeypatches this to force the
    live reference env's recorded chance outcomes; computation is unchanged."""
    pos_keys = jax.vmap(lambda i: jax.random.fold_in(k_eff, i))(jnp.arange(SEL))
    return jax.vmap(lambda k: jax.random.uniform(k, (3,)))(pos_keys)


def _purple_tarot_ids(k_seal):
    """[5] per-slot random tarot ids (1..22) for _discard's purple-seal
    creations (balatro_env_2.py:1020-1031). Module-level seam for the
    reference-differential test; computation is unchanged."""
    return jax.vmap(
        lambda i: jax.random.randint(jax.random.fold_in(k_seal, i), (), 1, 23, dtype=jnp.int32)
    )(jnp.arange(MAX_CONS))


def _play_hand(st: FullEnvState):
    """PLAY_HAND action. Returns (state, reward, terminated)."""
    st_in = st
    ranks, suits, enh, ed, seal, present = _hand_card_view(st)
    sel = st.selected & present
    n_played = jnp.sum(sel).astype(jnp.int32)

    k_eff, st = _stream(st, "card_enhancement")
    k_score, st = _stream(st, "joker_effects")
    k_boss, st = _stream(st, "boss_abilities")

    # BUG-FAITHFUL classification (#A39/#A40): the env highlights the
    # selection into game.highlighted_indexes (which play NEVER clears, so
    # it accumulates every selection since the last discard), then
    # classifies ``[game.deck[i] for i in highlighted_indexes]`` — indexing
    # the DECK by hand POSITION (deck slots 0..7), not the hand's cards
    # (balatro_env_2.py:663-671, balatro_game.py:30-33). The hand TYPE
    # therefore comes from deck slots of the accumulated positions while
    # card chips come from the truly selected cards.
    new_high = st.highlighted | sel
    ht = classify_env(st.card_rank[:SEL], st.card_suit[:SEL], new_high)

    base_score, _ = score_env_unified(
        ranks, suits, sel, enh, ed, st.hand_levels, st.jokers,
        st.hands_left, st.discards_left, jnp.int32(52), k_score, ht=ht,
    )

    # Boss play restriction check (balatro_env_2.py:677-680) — blocked plays
    # return -1 with no state change; handled at the end of this function.
    boss_ok = B.can_play(st.boss_id, st.boss_active, ht, n_played,
                         st.boss_played_types, st.boss_verdant_req)

    # --- per-card effects (balatro_env_2.py:703-734) ---
    rolls = _play_rolls(k_eff)
    # glass roll (rolls[:,0]) happens but destruction is a no-op (bug-faithful)
    lucky = sel & (enh == C.Enhancement.LUCKY)
    # lucky mult roll (rolls[:,1]) accumulates into a dead variable; only the
    # money roll pays out (balatro_env_2.py:717-724).
    lucky_money = jnp.sum(jnp.where(lucky & (rolls[:, 2] < C.LUCKY_MONEY_P), 20, 0))
    gold_seal_money = jnp.sum(jnp.where(sel & (seal == C.Seal.GOLD), 3, 0))
    extra_money = (lucky_money + gold_seal_money).astype(jnp.int32)

    # Blue seals create the planet of the played hand (cap at cons_slots).
    n_blue = jnp.sum(sel & (seal == C.Seal.BLUE)).astype(jnp.int32)
    planet_id = PLANET_OBS_OF_HAND[ht]
    free = jnp.clip(st.cons_slots - st.cons_n, 0, MAX_CONS)
    n_create = jnp.minimum(n_blue, free)
    slots5 = jnp.arange(MAX_CONS)
    newly = (slots5 >= st.cons_n) & (slots5 < st.cons_n + n_create)
    cons = jnp.where(newly, planet_id, st.cons)
    cons_n = st.cons_n + n_create

    # Red-seal retrigger count (×(1+0.5n) later).
    n_red = jnp.sum(sel & (seal == C.Seal.RED)).astype(jnp.int32)

    # --- steel bonus from cards left in hand (balatro_env_2.py:560-570) ---
    H10 = _hand_onehot(st)
    held = jnp.arange(MAX_HAND) < st.hand_n
    sel10 = jnp.concatenate([sel, jnp.zeros(MAX_HAND - SEL, bool)])
    is_steel = (H10 @ (st.card_enh == C.Enhancement.STEEL).astype(jnp.float32)) > 0
    steel_held = held & ~sel10 & is_steel
    # table dot, not lax.pow (backend-exact: core/pow_tables.py docstring)
    steel_mult = PT.pow15(jnp.sum(steel_held), _F)
    final_score = jnp.trunc(base_score.astype(_F) * steel_mult).astype(_I64)

    # --- boss scoring ratio (balatro_env_2.py:744-755) ---
    # engine.get_hand_chips_mult reads the ENGINE level, clamped at 15 by
    # apply_planet (scoring_engine.py:84) — see score_env_unified (#A41).
    level = jnp.minimum(st.hand_levels[ht], 15).astype(_I64)
    base_c = BASE_HAND_CHIPS[ht].astype(_I64) + (level - 1) * 10
    base_m = BASE_HAND_MULT[ht].astype(_I64) + (level - 1)
    H8 = _hand_onehot(st)[:SEL]
    played_before = sel & ((H8 @ st.boss_played_slots.astype(jnp.float32)) > 0)
    ratio = B.scoring_ratio(st.boss_id, st.boss_active, base_c, base_m,
                            ranks, sel, played_before)
    final_score = jnp.trunc(final_score.astype(_F) * ratio).astype(_I64)

    # --- retrigger (balatro_env_2.py:757-759) ---
    final_score = jnp.trunc(
        final_score.astype(_F) * (1.0 + 0.5 * n_red.astype(_F))).astype(_I64)

    # --- state updates ---
    old_round_score = st.round_chips_scored
    old_prog = jnp.minimum(1.0, old_round_score.astype(_F)
                           / jnp.maximum(1, st.chips_needed).astype(_F))
    round_score = old_round_score + final_score
    new_prog = jnp.minimum(1.0, round_score.astype(_F)
                           / jnp.maximum(1, st.chips_needed).astype(_F))

    st = st.replace(
        money=st.money + extra_money, cons=cons, cons_n=cons_n,
        round_chips_scored=round_score,
        chips_scored=st.chips_scored + final_score,
        hands_played_total=st.hands_played_total + 1,
        hands_played_ante=st.hands_played_ante + 1,
        best_hand_this_ante=jnp.maximum(st.best_hand_this_ante, final_score),
        hand_play_counts=st.hand_play_counts.at[ht].add(1),
        green_mult=st.green_mult + 1,  # Green Joker before_scoring counter
        selected=jnp.zeros(SEL, bool),
        highlighted=new_high,
    )
    # Ride the Bus counter: reset on face card scored, else +1.
    any_face = jnp.any(sel & (ranks >= 11) & (ranks <= 13))
    st = st.replace(bus_mult=jnp.where(any_face, 0, st.bus_mult + 1))

    # Boss on_hand_scored bookkeeping (boss_blinds.py:480-507): hand-type
    # set, first-hand flag, Pillar played-card marks, Verdant escalation.
    # (Tooth money / Serpent force-draw are throwaway-dict no-ops.)
    sel64 = (sel.astype(jnp.float32) @ H8) > 0
    st = st.replace(
        boss_played_types=jnp.where(
            st.boss_active,
            st.boss_played_types | (jnp.uint32(1) << ht.astype(jnp.uint32)),
            st.boss_played_types),
        boss_first_hand=jnp.where(st.boss_active, False, st.boss_first_hand),
        boss_played_slots=jnp.where(st.boss_active,
                                    st.boss_played_slots | sel64,
                                    st.boss_played_slots),
        boss_verdant_req=jnp.where(
            st.boss_active & (st.boss_id == B.VERDANT),
            jnp.minimum(7, st.boss_verdant_req + 1), st.boss_verdant_req),
    )

    # --- reward shaping (balatro_env_2.py:799-905) ---
    progress_reward = 15.0 * new_prog
    milestone = jnp.where(
        (old_prog < 0.25) & (new_prog >= 0.25), 5.0,
        jnp.where((old_prog < 0.5) & (new_prog >= 0.5), 10.0,
                  jnp.where((old_prog < 0.75) & (new_prog >= 0.75), 15.0,
                            jnp.where((old_prog < 1.0) & (new_prog >= 1.0), 25.0, 0.0))))
    score_reward = jnp.where(
        st.ante <= 3,
        jnp.minimum(10.0, final_score.astype(_F) / 100.0),
        jnp.minimum(10.0, 3.0 * jnp.log10(jnp.maximum(1, final_score).astype(_F))))
    quality = HAND_QUALITY[ht]
    efficiency = jnp.where(
        (ht >= HandType.THREE_KIND) & (n_played <= 3), 2.0,
        jnp.where((ht >= HandType.FLUSH) & (n_played == 5), 1.0,
                  jnp.where((n_played <= 4) & (st.hands_left <= 2), 1.5, 0.0)))
    synergy = jnp.zeros((), _F)
    synergy += jnp.where((ht == HandType.FLUSH) & _has_any_joker(st.jokers, _FLUSH_SYN), 2.0, 0.0)
    is_pairish = (ht == HandType.ONE_PAIR) | (ht == HandType.TWO_PAIR) | (ht == HandType.THREE_KIND)
    synergy += jnp.where(is_pairish & _has_any_joker(st.jokers, _PAIR_SYN), 1.5, 0.0)
    n_face = jnp.sum(sel & (ranks >= 11)).astype(_F)
    synergy += jnp.where((n_face > 0) & _has_any_joker(st.jokers, _FACE_SYN), 0.5 * n_face, 0.0)
    strategy = jnp.where((new_prog > 0.7) & (st.hands_left >= 3), 2.0,
                         jnp.where((new_prog < 0.3) & (ht >= HandType.FLUSH), 3.0, 0.0))
    ante_bonus = jnp.where(st.ante >= 4,
                           jnp.minimum(5.0, (st.ante - 3).astype(_F) * 0.5), 0.0)
    reward = (progress_reward + milestone + score_reward + quality * 2.0
              + efficiency * 1.5 + synergy * 3.0 + strategy * 2.0 + ante_bonus)
    reward = jnp.minimum(reward, 100.0)

    # --- round end / continue (balatro_env_2.py:913-960) ---
    beat = round_score >= st.chips_needed
    fail = ~beat & (st.hands_left <= 1)
    reward = reward + jnp.where(
        beat, jnp.minimum(50.0, 25.0 + 10.0 * st.ante.astype(_F)), 0.0)
    reward = reward + jnp.where(fail, -50.0 * (1.0 - new_prog), 0.0)

    adv = _advance_round(st)
    cont = _draw_cards(st.replace(hands_left=st.hands_left - 1))
    # Boss on_hand_drawn for the refreshed hand (balatro_env_2.py:936-948):
    # face-down flips + The Hook's forced discard of 2 random cards.
    c_present = jnp.arange(MAX_HAND) < cont.hand_n
    c_ranks = (_hand_onehot(cont) @ cont.card_rank.astype(jnp.float32)).astype(jnp.int32)
    c_ranks = jnp.where(c_present, c_ranks, 0)
    face10, hook10 = B.on_hand_drawn(k_boss, cont.boss_id,
                                     cont.boss_first_hand, c_ranks, c_present)
    boss_on = cont.boss_active
    cont = cont.replace(
        face_down=jnp.where(boss_on, face10[:SEL], cont.face_down))
    hooked = _remove_hand_positions(cont, hook10 & boss_on)
    cont = jax.tree.map(
        lambda a, b: jnp.where(boss_on & (cont.boss_id == B.HOOK), a, b),
        hooked, cont)

    st = jax.tree.map(
        lambda a, b: jnp.where(beat, a, b), adv,
        jax.tree.map(lambda a, b: jnp.where(fail, a, b), st, cont))
    reward = jnp.where(boss_ok, reward, -1.0)
    st = jax.tree.map(lambda a, b: jnp.where(boss_ok, a, b), st, st_in)
    # The reference highlights BEFORE the boss can_play check and returns
    # early on a block (balatro_env_2.py:663-680) — the highlight sticks
    # even for blocked plays.
    st = st.replace(highlighted=new_high)
    return st, reward, jnp.where(boss_ok, fail, False)


def _discard(st: FullEnvState):
    """DISCARD action (balatro_env_2.py:962-1050)."""
    ranks, suits, enh, ed, seal, present = _hand_card_view(st)
    sel = st.selected & present
    st_in_highlighted = st.highlighted
    n_sel = jnp.sum(sel).astype(jnp.int32)

    # Purple seals -> random tarots while slots free (balatro_env_2.py:1020-1031).
    k_seal, st = _stream(st, "seal_applications")
    n_purple = jnp.sum(sel & (seal == C.Seal.PURPLE)).astype(jnp.int32)
    free = jnp.clip(st.cons_slots - st.cons_n, 0, MAX_CONS)
    n_tarot = jnp.minimum(n_purple, free)
    slots5 = jnp.arange(MAX_CONS)
    tarot_ids = _purple_tarot_ids(k_seal)
    newly = (slots5 >= st.cons_n) & (slots5 < st.cons_n + n_tarot)
    cons = jnp.where(newly, tarot_ids, st.cons)

    # Joker discard money (complete_joker_effects.py:186-208).
    is_first = st.discards_left == 3
    trading = jnp.any(st.jokers == JT.J_TRADING_CARD) & is_first & (n_sel == 1)
    n_face_disc = jnp.sum(sel & (ranks >= 11) & (ranks <= 13))
    faceless = jnp.any(st.jokers == JT.J_FACELESS) & (n_face_disc >= 3)
    money_disc = (jnp.where(trading, 3, 0) + jnp.where(faceless, 5, 0)).astype(jnp.int32)
    # Green Joker loses 1 mult on discard (state only, score-neutral).
    green = jnp.maximum(0, st.green_mult - 1)
    # Reward counts jokers in the discard-synergy list (Faceless/Hit the
    # Road/Reserved Parking/Luchador, balatro_env_2.py:1006-1007).
    syn_ids = (JT.J_FACELESS, 130, 82, JT.J_LUCHADOR)  # Hit the Road 130, Reserved Parking 82
    n_syn = jnp.zeros((), jnp.int32)
    for i in syn_ids:
        n_syn = n_syn + jnp.sum(st.jokers == i).astype(jnp.int32)

    st = st.replace(
        money=st.money + money_disc, cons=cons, cons_n=st.cons_n + n_tarot,
        green_mult=green,
        discards_left=st.discards_left - 1,
        selected=jnp.zeros(SEL, bool),
        highlighted=jnp.zeros(SEL, bool),
    )
    # BUG-FAITHFUL (#A39): discard removes selected ∪ every position played
    # since the last discard — the env highlights the selection into
    # game.highlighted_indexes, which still holds the stale play highlights
    # (play never clears them), and discard_hand removes ALL of them
    # (balatro_env_2.py:1010-1016, balatro_game.py:111-127). Positions
    # >= hand_n are skipped by the descending removal's length guard.
    remove8 = (sel | st_in_highlighted) & (jnp.arange(SEL) < st.hand_n)
    sel10 = jnp.concatenate([remove8, jnp.zeros(MAX_HAND - SEL, bool)])
    st = _draw_cards(_remove_hand_positions(st, sel10))

    progress = st.round_chips_scored.astype(_F) / jnp.maximum(1, st.chips_needed).astype(_F)
    reward = 0.2 + 0.5 * n_syn.astype(_F) + money_disc.astype(_F) / 5.0
    reward = reward + jnp.where(
        (progress < 0.5) & (st.discards_left > 1), 0.5,
        jnp.where((progress > 0.8) & (st.discards_left > 1), -0.3, 0.0))
    return st, reward


def _step_play_phase(st: FullEnvState, action):
    """Route PLAY-phase actions."""
    played, r_play, term = _play_hand(st)
    discarded, r_disc = _discard(st)
    used, r_used = CL.use_consumable(st, action - Action.USE_CONSUMABLE_BASE)

    pos = jnp.clip(action - Action.SELECT_CARD_BASE, 0, SEL - 1)
    # One-hot XOR, NOT a bool scatter-set (XLA:TPU silently drops dynamic-index BOOL scatter updates in vmapped programs).
    toggled = st.replace(selected=st.selected ^ (jnp.arange(SEL) == pos))

    is_play = action == Action.PLAY_HAND
    is_disc = action == Action.DISCARD
    is_sel = (action >= Action.SELECT_CARD_BASE) & (action < Action.SELECT_CARD_BASE + SEL)
    is_use = (action >= Action.USE_CONSUMABLE_BASE) & \
        (action < Action.USE_CONSUMABLE_BASE + Action.USE_CONSUMABLE_COUNT)

    def pick(a, b, c, d, e):
        return jnp.where(is_play, a,
                         jnp.where(is_disc, b,
                                   jnp.where(is_sel, c, jnp.where(is_use, d, e))))

    st2 = jax.tree.map(pick, played, discarded, toggled, used, st)
    reward = pick(r_play, r_disc, jnp.zeros((), _F), r_used.astype(_F),
                  jnp.full((), -1.0, _F))
    terminated = jnp.where(is_play, term, False)
    return st2, reward, terminated


# ---------------------------------------------------------------------------
# Shop phase (balatro_env_2.py:1174-1253)
# ---------------------------------------------------------------------------


def _shop_buy(st: FullEnvState, idx):
    """Buy inventory item idx (affordability/validity pre-masked)."""
    idx = jnp.clip(idx, 0, SL.SHOP_SLOTS - 1)
    itype = st.shop_type[idx]
    item = st.shop_item[idx]
    cost = st.shop_cost[idx]

    joker_full = st.joker_n >= st.joker_slots
    buy_joker = (itype == SL.IT_JOKER) & ~joker_full
    # BUG-FAITHFUL: shop.step deducts the cost and pops the item BEFORE the
    # joker-slots check (shop.py:186-198), so a slots-full joker buy still
    # loses the money and the inventory item; only the joker is not added
    # and the reward is -1.
    blocked = (itype == SL.IT_JOKER) & joker_full

    types, items, costs, n = SL.pop_item(st.shop_type, st.shop_item, st.shop_cost, st.shop_n, idx)
    jokers = jnp.where(
        buy_joker,
        st.jokers.at[jnp.clip(st.joker_n, 0, MAX_JOKERS - 1)].set(item),
        st.jokers)
    vouchers = jnp.where(
        itype == SL.IT_VOUCHER,
        st.vouchers | (jnp.uint32(1) << item.astype(jnp.uint32)),
        st.vouchers)

    st2 = st.replace(
        money=st.money - cost,
        shop_type=types, shop_item=items, shop_cost=costs, shop_n=n,
        jokers=jokers,
        joker_n=st.joker_n + jnp.where(buy_joker, 1, 0),
        vouchers=vouchers,
    )
    # Purchase rewards (balatro_env_2.py:1225-1241): pack 5, joker 15,
    # card 3, voucher 10.
    reward = jnp.where(
        blocked, -1.0,
        jnp.where(itype == SL.IT_PACK, 5.0,
                  jnp.where(itype == SL.IT_JOKER, 15.0,
                            jnp.where(itype == SL.IT_CARD, 3.0,
                                      jnp.where(itype == SL.IT_VOUCHER, 10.0, -1.0)))))
    return st2, reward.astype(_F)


def _shop_reroll(st: FullEnvState):
    cost, next_base = SL.reroll_charge(st.reroll_base, st.ante, st.vouchers)
    # Mask uses the stale displayed cost; the actual charge may exceed money —
    # the reference then returns -1 without changes (shop.py:172-173).
    afford = st.money >= cost
    k, st = _stream(st, "shop_reroll")
    types, items, costs, n = SL.generate_inventory(k, st.ante, st.jokers, st.vouchers)
    rerolled = st.replace(
        money=st.money - cost, reroll_base=next_base,
        shop_type=types, shop_item=items, shop_cost=costs, shop_n=n)
    st2 = jax.tree.map(lambda a, b: jnp.where(afford, a, b), rerolled, st)
    return st2, jnp.where(afford, 0.0, -1.0).astype(_F)


def _sell_joker(st: FullEnvState, idx):
    """Sell joker idx: value max(3, base_cost//2) (balatro_env_2.py:1202-1213)."""
    idx = jnp.clip(idx, 0, MAX_JOKERS - 1)
    jid = st.jokers[idx]
    value = jnp.maximum(3, jnp.asarray(JT.JOKER_BASE_COST)[jid] // 2).astype(jnp.int32)
    slots = jnp.arange(MAX_JOKERS)
    shifted = st.jokers[jnp.clip(slots + 1, 0, MAX_JOKERS - 1)]
    jokers = jnp.where(slots < idx, st.jokers, shifted)
    jokers = jnp.where(slots >= st.joker_n - 1, 0, jokers)
    st = st.replace(
        jokers=jokers, joker_n=st.joker_n - 1,
        money=st.money + value, jokers_sold=st.jokers_sold + 1)
    return st, (value.astype(_F) / 5.0)


def _shop_end(st: FullEnvState):
    st = st.replace(phase=jnp.int32(Phase.PLAY))
    return _draw_cards(st), jnp.zeros((), _F)


def _step_shop_phase(st: FullEnvState, action):
    bought, r_buy = _shop_buy(st, action - Action.SHOP_BUY_BASE)
    rerolled, r_re = _shop_reroll(st)
    sold, r_sell = _sell_joker(st, action - Action.SELL_JOKER_BASE)
    ended, r_end = _shop_end(st)

    is_buy = (action >= Action.SHOP_BUY_BASE) & (action < Action.SHOP_BUY_BASE + Action.SHOP_BUY_COUNT)
    is_re = action == Action.SHOP_REROLL
    is_sell = (action >= Action.SELL_JOKER_BASE) & (action < Action.SELL_JOKER_BASE + MAX_JOKERS)
    is_end = action == Action.SHOP_END

    def pick(a, b, c, d, e):
        return jnp.where(is_buy, a,
                         jnp.where(is_re, b,
                                   jnp.where(is_sell, c, jnp.where(is_end, d, e))))

    st2 = jax.tree.map(pick, bought, rerolled, sold, ended, st)
    reward = pick(r_buy, r_re, r_sell, r_end, jnp.full((), -1.0, _F))
    return st2, reward, jnp.zeros((), bool)


# ---------------------------------------------------------------------------
# Blind-select phase (balatro_env_2.py:1255-1318)
# ---------------------------------------------------------------------------


def _select_blind(st: FullEnvState, blind_type):
    blind_type = jnp.clip(blind_type, 0, 2)
    chips = get_blind_chips(st.ante, blind_type)
    is_boss = blind_type == 2

    k_boss, st = _stream(st, "boss_abilities")
    boss_id = B.select_boss(k_boss)
    chips = jnp.where(
        is_boss,
        jnp.trunc(chips.astype(_F) * B.BOSS_CHIP_MULT[boss_id].astype(_F)).astype(chips.dtype),
        chips)
    d_disc, d_hsize, d_hands = B.activation_mods(boss_id)
    st = st.replace(
        round=blind_type.astype(jnp.int32) + 1,
        chips_needed=chips.astype(_I64),
        discards_left=jnp.where(is_boss & (d_disc >= 0), d_disc, st.discards_left),
        hand_size=jnp.where(is_boss, st.hand_size + d_hsize, st.hand_size),
        hands_left=jnp.where(is_boss & (d_hands >= 0), d_hands, st.hands_left),
        boss_active=is_boss,
        boss_id=jnp.where(is_boss, boss_id, -1),
        boss_played_types=jnp.uint32(0),
        boss_first_hand=jnp.ones((), bool),
        boss_verdant_req=jnp.int32(5),
        boss_played_slots=jnp.zeros(MAX_DECK, bool),
        phase=jnp.int32(Phase.PLAY),
    )
    st = _draw_cards(st)
    return st, jnp.where(is_boss, 10.0, 0.0).astype(_F)


def _step_blind_phase(st: FullEnvState, action):
    selected, r_sel = _select_blind(st, action - Action.SELECT_BLIND_BASE)
    skipped = _advance_round(st)
    r_skip = jnp.full((), -5.0, _F)

    is_sel = (action >= Action.SELECT_BLIND_BASE) & (action < Action.SELECT_BLIND_BASE + 3)
    is_skip = action == Action.SKIP_BLIND

    def pick(a, b, c):
        return jnp.where(is_sel, a, jnp.where(is_skip, b, c))

    st2 = jax.tree.map(pick, selected, skipped, st)
    reward = pick(r_sel, r_skip, jnp.full((), -1.0, _F))
    return st2, reward, jnp.zeros((), bool)


def _step_pack_phase(st: FullEnvState, action):
    """Unreachable in the reference (nothing sets PACK_OPEN); mirrored as
    phase→SHOP + regenerate (balatro_env_2.py:1320-1324)."""
    st = _generate_shop(st.replace(phase=jnp.int32(Phase.SHOP)))
    return st, jnp.zeros((), _F), jnp.zeros((), bool)


# ---------------------------------------------------------------------------
# Mask / step / observe
# ---------------------------------------------------------------------------


def action_mask(st: FullEnvState):
    """[60] legal-action mask (balatro_env_2.py:1426-1471)."""
    ids = jnp.arange(NA)
    any_sel = jnp.any(st.selected)
    n_selectable = jnp.minimum(SEL, st.hand_n)

    play = jnp.zeros(NA, bool)
    play = play.at[Action.PLAY_HAND].set(any_sel)
    play = play.at[Action.DISCARD].set(any_sel & (st.discards_left > 0))
    sel_ids = ids - Action.SELECT_CARD_BASE
    play = play | ((sel_ids >= 0) & (sel_ids < n_selectable))
    con_ids = ids - Action.USE_CONSUMABLE_BASE
    play = play | ((con_ids >= 0) & (con_ids < st.cons_n))

    shop = jnp.zeros(NA, bool)
    buy_ids = ids - Action.SHOP_BUY_BASE
    afford = (buy_ids >= 0) & (buy_ids < st.shop_n) & \
        (st.money >= st.shop_cost[jnp.clip(buy_ids, 0, SL.SHOP_SLOTS - 1)])
    shop = shop | afford
    shop = shop.at[Action.SHOP_REROLL].set(st.money >= st.shop_reroll_cost)
    shop = shop.at[Action.SHOP_END].set(True)
    sell_ids = ids - Action.SELL_JOKER_BASE
    shop = shop | ((sell_ids >= 0) & (sell_ids < st.joker_n))

    blind = jnp.zeros(NA, bool)
    blind_ids = ids - Action.SELECT_BLIND_BASE
    blind = blind | ((blind_ids >= 0) & (blind_ids < 3))
    blind = blind.at[Action.SKIP_BLIND].set(True)

    pack = jnp.zeros(NA, bool)  # PACK_OPEN has no mask branch (bug-faithful)

    mask = jnp.where(st.phase == Phase.PLAY, play,
                     jnp.where(st.phase == Phase.SHOP, shop,
                               jnp.where(st.phase == Phase.BLIND_SELECT, blind, pack)))
    return mask & ~st.done


def step(st: FullEnvState, action):
    """One flagship-env step. Returns (state, reward f, done bool)."""
    action = jnp.asarray(action, jnp.int32)

    # Termination checks FIRST (balatro_env_2.py:619-623).
    over = (st.ante > 100) | (st.chips_scored > 1_000_000_000) | st.done
    valid = action_mask(st)[jnp.clip(action, 0, NA - 1)]

    p_st, p_r, p_t = _step_play_phase(st, action)
    s_st, s_r, s_t = _step_shop_phase(st, action)
    b_st, b_r, b_t = _step_blind_phase(st, action)
    k_st, k_r, k_t = _step_pack_phase(st, action)

    def pick(a, b, c, d):
        return jnp.where(st.phase == Phase.PLAY, a,
                         jnp.where(st.phase == Phase.SHOP, b,
                                   jnp.where(st.phase == Phase.BLIND_SELECT, c, d)))

    nxt = jax.tree.map(pick, p_st, s_st, b_st, k_st)
    reward = pick(p_r, s_r, b_r, k_r)
    terminated = pick(p_t, s_t, b_t, k_t)

    # Invalid action: -1 reward, no state change (balatro_env_2.py:625-627).
    nxt = jax.tree.map(lambda a, b: jnp.where(valid, a, b), nxt, st)
    reward = jnp.where(valid, reward, -1.0)
    terminated = jnp.where(valid, terminated, False)

    # Terminated-before-step: freeze everything, reward 0.
    nxt = jax.tree.map(lambda a, b: jnp.where(over, a, b), st, nxt)
    reward = jnp.where(over, 0.0, reward)
    done = over | terminated
    nxt = nxt.replace(done=done, step_count=st.step_count + 1)
    return nxt, reward.astype(jnp.float32), done


def step_autoreset(st: FullEnvState, action):
    st2, reward, done = step(st, action)
    fresh = reset(jax.random.fold_in(st2.key, st2.step_count))
    st3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, st2)
    return st3, reward, done


OBS_VEC_DIM = 8 * 17 + MAX_JOKERS + NUM_HAND_TYPES + SL.SHOP_SLOTS * 2 + 4 + 12


def observe_vector(st: FullEnvState):
    """Compact flat f32 observation for the on-device policy (the learner's
    analogue of the reference's BalatroFeaturesExtractor input,
    train_balatro_agent.py:42-119). Single env; vmap outside."""
    ranks, suits, enh, ed, seal, present = _hand_card_view(st)
    rank_oh = (ranks[:, None] == jnp.arange(2, 15)) & present[:, None]
    suit_oh = (suits[:, None] == jnp.arange(4)) & present[:, None]
    cards = jnp.concatenate([rank_oh, suit_oh], axis=-1).reshape(-1).astype(jnp.float32)
    phase_oh = (st.phase == jnp.arange(4)).astype(jnp.float32)
    cn = jnp.maximum(1, st.chips_needed).astype(jnp.float32)
    scalars = jnp.stack([
        st.money.astype(jnp.float32) / 20.0,
        st.ante.astype(jnp.float32) / 8.0,
        st.round.astype(jnp.float32) / 3.0,
        st.hands_left.astype(jnp.float32) / 4.0,
        st.discards_left.astype(jnp.float32) / 3.0,
        jnp.minimum(2.0, st.round_chips_scored.astype(jnp.float32) / cn),
        jnp.log1p(st.chips_needed.astype(jnp.float32)) / 10.0,
        st.joker_n.astype(jnp.float32) / 5.0,
        st.cons_n.astype(jnp.float32) / 2.0,
        st.boss_active.astype(jnp.float32),
        jnp.where(st.boss_active, st.boss_id, 0).astype(jnp.float32) / 28.0,
        jnp.any(st.selected).astype(jnp.float32),
    ])
    return jnp.concatenate([
        cards,
        st.jokers.astype(jnp.float32) / 150.0,
        st.hand_levels.astype(jnp.float32) / 15.0,
        st.shop_type.astype(jnp.float32) / 4.0,
        jnp.minimum(1.0, st.shop_cost.astype(jnp.float32) / 1000.0),
        phase_oh,
        scalars,
    ])


def observe(st: FullEnvState):
    """The reference's ~30-key Dict observation as device arrays
    (balatro_env_2.py:1473-1541). Dtypes are canonical int32/float32 on
    device; the Gym shell casts to the reference's exact numpy dtypes."""
    ranks, suits, enh, ed, seal, present = _hand_card_view(st)
    hand = jnp.where(present, C.encode_rs(ranks, suits), -1)
    return {
        "hand": hand,
        "hand_size": st.hand_n,
        "deck_size": jnp.sum(st.card_alive, dtype=jnp.int32),
        "selected_cards": st.selected.astype(jnp.int32),
        "chips_scored": st.chips_scored,
        "round_chips_scored": st.round_chips_scored,
        "progress_ratio": jnp.minimum(
            2.0, st.round_chips_scored.astype(jnp.float32)
            / jnp.maximum(1, st.chips_needed).astype(jnp.float32)),
        "mult": jnp.int32(1),
        "chips_needed": st.chips_needed,
        "money": st.money,
        "ante": st.ante,
        "round": st.round,
        "hands_left": st.hands_left,
        "discards_left": st.discards_left,
        "joker_count": st.joker_n,
        "joker_ids": jnp.concatenate([st.jokers, jnp.zeros(5, jnp.int32)]),
        "joker_slots": st.joker_slots,
        "consumable_count": st.cons_n,
        # Enum-name-form entries (+100, Emperor creations) observe as id 0,
        # matching the reference's id-map miss (balatro_env_2.py:1543-1573).
        "consumables": jnp.where(st.cons >= CL.ENUMNAME_OFFSET, 0, st.cons),
        "consumable_slots": st.cons_slots,
        "shop_items": jnp.where(st.phase == Phase.SHOP, st.shop_type, 0),
        "shop_costs": jnp.where(st.phase == Phase.SHOP, st.shop_cost, 0),
        "shop_rerolls": st.shop_reroll_cost,
        "hand_levels": st.hand_levels,
        "phase": st.phase,
        "action_mask": action_mask(st).astype(jnp.int32),
        "hands_played": st.hands_played_total,
        "best_hand_this_ante": st.best_hand_this_ante,
        "boss_blind_active": st.boss_active.astype(jnp.int32),
        "boss_blind_type": jnp.where(st.boss_active, st.boss_id, 0),
        "face_down_cards": st.face_down.astype(jnp.int32),
    }

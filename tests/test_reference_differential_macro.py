"""Differential replay against the LIVE reference macro env
(``BalatroEnvComplete``, balatro_env_v2.py:67-400).

Steps the reference and this repo's ``envs/macro_env`` side by side with
identical scripted actions and asserts per-step equality of every shared
observation field (including the shop inventory keys), the action mask, the
reward and the done flag.

**Behavior-neutral shims** (the reference env cannot import or run a play
step without them — each is cited and changes nothing observable):

* ``balatro_env_v2.py:16`` imports ``Planet`` from ``scoring_engine`` where
  it does not exist (it lives in ``planets.py``) — injected before import.
* ``balatro_sim.calculate_score`` calls ``ScoreEngine.score(...)``
  (balatro_sim.py:418) which does not exist (scoring_engine.py:61-145); its
  result feeds ONLY a DEBUG print (:422) before the real arithmetic starts
  at :425 — shimmed to return 0 (same shim as
  scripts/mint_reference_fixtures.py).

**Live facts this harness is built around** (all verified by running the
reference):

* ``BalatroGame.deck`` starts EMPTY and nothing in the v2 env populates it
  (balatro_game.py:17-19); ``_draw_cards`` therefore deals nothing and the
  live obs ``hand`` has shape (0,), violating the env's own (8,) space
  declaration (balatro_env_v2.py:80). The env treats ``hand`` entries as
  0-51 CARD CODES (``_indexes_to_cards``, :143-151) even though they are
  deck indexes — planting ``game.hand_indexes`` directly with 8 card codes
  is the minimal surgery that makes the env behave as its own code intends,
  and the planted hand is STATIC for the whole episode (plays never remove
  cards — ``_step_play`` only re-calls ``_deal`` whose draw is a no-op on a
  full hand; discards remove only ``highlighted_indexes``, which the env
  never sets, balatro_game.py:111-127). Our env deals fresh cards by
  design (PARITY #B15) — the forced-deal seam pins our hand to the planted
  one so everything downstream is compared exactly.
* Shop inventories are random (``Shop.rng``, shop.py:99) — mirrored into
  our ``shop_logic.generate_inventory`` seam after every reference step,
  exactly like the flagship harness. Joker items are rewritten in-place to
  a deterministic cycle of RNG-FREE jokers (Misprint rolls
  ``random.randint`` and Bloodstone ``random.random`` INSIDE scoring,
  complete_joker_effects.py:42,161 — their outcomes are not recoverable
  from the result) with the shop's own cost arithmetic
  (``int(base_cost * _cost_mult())``, shop.py:126-128).

Crash landmines NOT stepped on (each is a reference crash, so there is no
live behavior to compare — documented in PARITY #B15):

* card-verb buys of non-card slots (``payload["card"]`` KeyError,
  shop.py:195) — scripts aim card-verb at card slots only;
* joker-verb buys of non-joker slots while holding <5 jokers AND able to
  afford them (``payload["joker_id"]`` KeyError, shop.py:199) — the slot-8
  collision (#A34) is exercised in its non-crashing configurations;
* shop-phase actions < 10 (``ShopAction.decode`` raises, shop.py:57-68).
"""
import random as pyrandom
import sys
from collections import defaultdict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/balatro_gym")

ref_se = pytest.importorskip("balatro_gym.scoring_engine")

# --- behavior-neutral import/run shims (see module docstring) --------------
from balatro_gym.planets import Planet as _RefPlanet  # noqa: E402

ref_se.Planet = _RefPlanet
if not hasattr(ref_se.ScoreEngine, "score"):
    ref_se.ScoreEngine.score = lambda self, card_ids, hand_type, level: 0
# balatro_sim.py:6 imports the BARE ``scoring_engine`` module (no package
# prefix — SURVEY §2.8), a distinct module object with its own ScoreEngine
# class; shim that copy too.
import scoring_engine as ref_se_bare  # noqa: E402

if not hasattr(ref_se_bare.ScoreEngine, "score"):
    ref_se_bare.ScoreEngine.score = \
        lambda self, card_ids, hand_type, level: 0

ref_v2 = pytest.importorskip("balatro_gym.balatro_env_v2")

from balatro_gym.jokers import JOKER_LIBRARY  # noqa: E402
from balatro_gym.shop import ItemType, Shop  # noqa: E402

from balatro_gym_tpu.core import cards as C  # noqa: E402
from balatro_gym_tpu.envs import macro_env as ME  # noqa: E402
from balatro_gym_tpu.engine import shop_logic as SL  # noqa: E402

PACK_KIND = {"Standard Pack": SL.PACK_STANDARD, "Joker Pack": SL.PACK_JOKER,
             "Tarot Pack": SL.PACK_TAROT, "Planet Pack": SL.PACK_PLANET,
             "Spectral Pack": SL.PACK_SPECTRAL}
PACK_NAME = {v: k for k, v in PACK_KIND.items()}

JOKER_BY_NAME = {j.name: j for j in JOKER_LIBRARY}

# Deterministic-effect jokers (no random.* inside their effect paths,
# complete_joker_effects.py) spanning every effect family our sim scorer
# implements: flat chips/mult/x-mult, hand-type conditions, suit conditions,
# per-card rank/face/suit effects, in-scoring money, full-hand conditions,
# state-dependent (Abstract/Blue Joker/Half/Acrobat/Mystic Summit #A31).
SAFE_JOKER_NAMES = [
    "Joker", "Jolly Joker", "Zany Joker", "Mad Joker", "Crazy Joker",
    "Droll Joker", "Sly Joker", "Wily Joker", "Clever Joker",
    "Devious Joker", "Crafty Joker", "Half Joker", "Abstract Joker",
    "Banner", "Mystic Summit", "Blue Joker", "Greedy Joker", "Lusty Joker",
    "Wrathful Joker", "Gluttonous Joker", "Scary Face", "Smiley Face",
    "Even Steven", "Odd Todd", "Scholar", "Walkie Talkie", "Wee Joker",
    "Fibonacci", "Arrowhead", "Onyx Agate", "Rough Gem", "Baron",
    "Shoot the Moon", "Blackboard", "Seeing Double", "Flower Pot",
    "The Duo", "The Trio", "The Family", "The Order", "The Tribe",
    "Acrobat", "Stuntman", "Gros Michel", "Cavendish", "Popcorn",
    "Ice Cream",
]
# ids must fit int8: owning a joker with id >= 128 CRASHES the reference's
# obs build (np.int8 assignment overflow, balatro_env_v2.py:330-333 — numpy
# 2.x raises OverflowError) — one more live landmine, not a comparable
# behavior.
SAFE_JOKERS = [JOKER_BY_NAME[n] for n in SAFE_JOKER_NAMES
               if n in JOKER_BY_NAME and JOKER_BY_NAME[n].base_cost > 0
               and JOKER_BY_NAME[n].id <= 127]
assert len(SAFE_JOKERS) >= 35, [n for n in SAFE_JOKER_NAMES
                                if n not in JOKER_BY_NAME]


class _JokerCycle:
    """Deterministic joker rewriter for Shop._generate_inventory."""

    def __init__(self):
        self.i = 0

    def next_id(self, exclude):
        for _ in range(len(SAFE_JOKERS)):
            j = SAFE_JOKERS[self.i % len(SAFE_JOKERS)]
            self.i += 1
            if j.id not in exclude:
                return j
        return SAFE_JOKERS[0]


JOKER_CYCLE = _JokerCycle()
_ORIG_GEN = Shop._generate_inventory


def _patched_gen(self):
    """Run the live generator, then rewrite JOKER items to the deterministic
    safe cycle using the shop's own cost arithmetic (shop.py:124-128)."""
    _ORIG_GEN(self)
    seen = set(self.player.jokers)
    for it in self.inventory:
        if it.item_type == ItemType.JOKER:
            j = JOKER_CYCLE.next_id(seen)
            seen.add(j.id)
            it.name = j.name
            it.cost = int(j.base_cost * self._cost_mult())
            it.payload = {"joker_id": j.id}


# ---------------------------------------------------------------------------
# Forced-chance seams (the flagship harness's TRACE pattern: forced values
# ride as jit arguments; the patched seams read the trace-time context).
# ---------------------------------------------------------------------------

TRACE = {}


def neutral_forced():
    return {
        "deal_rank": np.full(ME.HAND, 2, np.int32),
        "deal_suit": np.zeros(ME.HAND, np.int32),
        "shop_types": np.zeros(SL.SHOP_SLOTS, np.int32),
        "shop_items": np.zeros(SL.SHOP_SLOTS, np.int32),
        "shop_costs": np.zeros(SL.SHOP_SLOTS, np.int32),
        "shop_n": np.int32(0),
    }


def fake_deal(st):
    return st.replace(hand_rank=jnp.asarray(TRACE["deal_rank"]),
                      hand_suit=jnp.asarray(TRACE["deal_suit"]))


def fake_generate_inventory(key, ante, owned_jokers, vouchers):
    del key, ante, owned_jokers, vouchers
    return (jnp.asarray(TRACE["shop_types"]), jnp.asarray(TRACE["shop_items"]),
            jnp.asarray(TRACE["shop_costs"]),
            jnp.asarray(TRACE["shop_n"], jnp.int32))


@jax.jit
def _step_forced(st, a, forced):
    TRACE.clear()
    TRACE.update(forced)
    return ME.step(st, a)


_observe_j = jax.jit(ME.observe)
_mask_j = jax.jit(ME.action_mask)


@pytest.fixture
def seams(monkeypatch):
    monkeypatch.setattr(ME, "_deal", fake_deal)
    monkeypatch.setattr(SL, "generate_inventory", fake_generate_inventory)
    monkeypatch.setattr(Shop, "_generate_inventory", _patched_gen)
    TRACE.clear()
    TRACE.update(neutral_forced())
    yield


# ---------------------------------------------------------------------------
# Reference-side helpers
# ---------------------------------------------------------------------------


def hand_to_rank_suit(hand_ids):
    ids = np.asarray(hand_ids, np.int64)
    ranks = (ids % 13 + 2).astype(np.int32)
    suits = np.asarray(C.SIM_TO_CANON_SUIT)[ids // 13].astype(np.int32)
    return ranks, suits


def make_ref(seed, hand_ids):
    pyrandom.seed(5000 + seed)  # global random: joker-effect draws (none
    # fire for SAFE jokers, but 8 Ball-style consumption stays seeded)
    env = ref_v2.BalatroEnvComplete()
    env.reset(seed=seed)
    # Deck surgery (module docstring): plant 8 card codes as the hand.
    env.game.hand_indexes = [int(x) for x in hand_ids]

    # _deal stores the hand as np.int8 (v2:141); Card.rank/base_value then
    # inherit int8 and calculate_score's chips accumulation WRAPS at 127
    # (numpy2 int8 scalar adds; observed live: Four-of-a-Kind hand scoring
    # -27378). The wrap is unreachable in the pristine reference (the empty
    # deck means no card ever scores), so it is an artifact of the surgery
    # x dtype interaction, not reference behavior — plant a wide-dtype hand
    # and keep _deal from re-narrowing it.
    def _deal_wide():
        env.game._draw_cards()
        env.hand = np.array(env.game.hand_indexes[:8], dtype=np.int64)

    env._deal = _deal_wide
    env._deal()
    return env


def ref_shop_arrays(env):
    types = np.zeros(SL.SHOP_SLOTS, np.int32)
    items = np.zeros(SL.SHOP_SLOTS, np.int32)
    costs = np.zeros(SL.SHOP_SLOTS, np.int32)
    inv = env.shop.inventory if env.shop else []
    for i, it in enumerate(inv):
        types[i] = int(it.item_type)
        costs[i] = int(it.cost)
        p = it.payload
        if "pack_type" in p:
            items[i] = PACK_KIND[p["pack_type"]]
        elif "joker_id" in p:
            items[i] = p["joker_id"]
        elif "voucher" in p:
            items[i] = SL.VOUCHER_NAMES.index(p["voucher"])
        elif "card" in p:
            items[i] = p["card"]
    return types, items, costs, np.int32(len(inv))


def our_shop_extra(st):
    """Rebuild the reference's ragged shop obs keys (shop.get_observation,
    shop.py:142-147; merged into the obs only in the shop phase,
    balatro_env_v2.py:352-353) from our fixed-shape state."""
    n = int(np.asarray(st.shop_n))
    t, c, p = [], [], []
    for i in range(n):
        ty = int(np.asarray(st.shop_type[i]))
        it = int(np.asarray(st.shop_item[i]))
        t.append(ty)
        c.append(int(np.asarray(st.shop_cost[i])))
        if ty == SL.IT_PACK:
            p.append({"pack_type": PACK_NAME[it]})
        elif ty == SL.IT_JOKER:
            p.append({"joker_id": it})
        elif ty == SL.IT_VOUCHER:
            p.append({"voucher": SL.VOUCHER_NAMES[it]})
        else:
            p.append({"card": it})
    return {"shop_item_type": t, "shop_cost": c, "shop_payload": p}


def compare_obs(obs_r, obs_o, t, ctx, skip=()):
    assert set(obs_r) == set(obs_o), (
        f"step {t}: obs key sets differ {ctx}: "
        f"ref-only={sorted(set(obs_r) - set(obs_o))} "
        f"ours-only={sorted(set(obs_o) - set(obs_r))}")
    for k in obs_r:
        if k in skip:
            continue
        if k == "shop_payload":
            assert [dict(d) for d in obs_r[k]] == obs_o[k], \
                f"step {t}: obs[shop_payload] {ctx}"
            continue
        a = np.asarray(obs_r[k], np.int64)
        b = np.asarray(obs_o[k], np.int64)
        np.testing.assert_array_equal(b, a, err_msg=f"step {t}: obs[{k}] {ctx}")


def full_obs_ours(st):
    obs = {k: np.asarray(v) for k, v in _observe_j(st).items()}
    if int(obs["phase"]) == ME.PHASE_SHOP:
        obs.update(our_shop_extra(st))
    return obs


# ---------------------------------------------------------------------------
# Scripted policy
# ---------------------------------------------------------------------------


def shop_action_for(env, st, token, counters):
    """Translate a shop-plan token into an action id against the LIVE
    inventory (identical to ours — the seam forces it). Returns None if the
    token has no safe target this shop."""
    inv = env.shop.inventory if env.shop else []
    chips = env.player.chips
    n_jok = len(env.simulator.player_state.jokers)

    def first_slot(item_type, affordable=None, max_idx=7):
        for i, it in enumerate(inv[:max_idx + 1]):
            if it.item_type == item_type:
                if affordable is None or (it.cost <= chips) == affordable:
                    return i
        return None

    # Keep total jokers under our 16 physical slots (ME.JOKER_CAP): the
    # reference list is unbounded; scripts stop ACQUIRING at 14 (well past
    # the nominal 5-slot cap, so the unbounded-acquisition semantics are
    # still exercised).
    if n_jok >= 14 and token in ("pack_verb_joker", "joker_verb",
                                 "fail_joker", "collision"):
        return None

    if token == "skip":
        return 10
    if token == "reroll":
        return 11
    if token == "pack_verb_pack":
        i = first_slot(ItemType.PACK)
        return None if i is None else 12 + i
    if token == "pack_verb_joker":  # id-soup: joker bought through pack verb
        i = first_slot(ItemType.JOKER)
        return None if i is None else 12 + i
    if token == "pack_verb_card":
        i = first_slot(ItemType.CARD)
        return None if i is None else 12 + i
    if token == "pack_verb_voucher":  # voucher lost through the pack verb
        i = first_slot(ItemType.VOUCHER)
        return None if i is None else 12 + i
    if token == "joker_verb":
        # KeyError landmine: only aim at an actual joker slot.
        i = first_slot(ItemType.JOKER, affordable=True)
        return None if i is None else 20 + i
    if token == "fail_joker":  # #A43: unaffordable joker buy appends free
        i = first_slot(ItemType.JOKER, affordable=False)
        if i is None:
            return None
        counters["fail_joker_armed"] += 1
        return 20 + i
    if token == "card_verb":
        i = first_slot(ItemType.CARD, affordable=True)
        return None if i is None else 40 + i
    if token == "voucher_verb":
        i = first_slot(ItemType.VOUCHER, affordable=True)
        return None if i is None else 60 + i
    if token == "collision":
        # Action 20 = BUY_PACK_BASE+8 (the mask's slot-8 id) decodes as
        # buy_joker slot 0 (#A34). Safe configurations only: slot 0 IS a
        # joker (plain joker-verb semantics), or >=5 jokers held (charged,
        # popped, -1, no KeyError), or slot 0 unaffordable (refused before
        # the payload access).
        if not inv:
            return None
        it0 = inv[0]
        if it0.item_type == ItemType.JOKER or n_jok >= 5 or it0.cost > chips:
            counters["collision_armed"] += 1
            return 20
        return None
    if token == "bad_index":
        # card-verb one past the end: "Invalid shop index" -1 (shop.py:181)
        return 40 + len(inv)
    raise KeyError(token)


# Per-round shop scripts, cycled per ante; exercise every verb, the id-soup,
# the collision, the #A43 failed-buy append, rerolls and bad indexes.
SHOP_PLANS = [
    ["pack_verb_pack", "pack_verb_joker", "reroll", "voucher_verb", "skip"],
    ["joker_verb", "card_verb", "pack_verb_card", "skip"],
    ["fail_joker", "joker_verb", "bad_index", "skip"],
    ["pack_verb_voucher", "joker_verb", "collision", "skip"],
    ["reroll", "reroll", "fail_joker", "joker_verb", "skip"],
    ["collision", "card_verb", "pack_verb_joker", "skip"],
    ["joker_verb", "pack_verb_joker", "joker_verb", "collision", "skip"],
]

# Play-phase scripts: interleave the 3 discard macros (+1 exhausted-discard
# -1 witness) with all 6 play strategies.
PLAY_PLANS = [
    [6, 0, 7, 1, 8, 2, 6, 3, 4, 5],
    [8, 8, 8, 8, 0, 1, 2, 3],      # 4th discard hits the -1 branch
    [7, 2, 6, 4, 8, 5, 0, 1],
    [0, 1, 2, 3, 4, 5, 6, 7],
    [9, 5, 4, 6, 3, 2, 8, 1, 0],   # 9 = play-phase no-op (reward 0)
]

# Hands (8 sim card codes 0-51: suit*13 + rank-2, Spades/Hearts/Diamonds/
# Clubs) engineered for macro-selection breadth.
HANDS = [
    [0, 13, 1, 2, 3, 17, 30, 45],    # two pairs (2s, 6s)
    [11, 24, 37, 50, 12, 25, 38, 5],  # KKKK + AAA + 7 (quads/trips cascade)
    [10, 23, 36, 9, 22, 8, 21, 7],    # QQQ JJ TT 9: full-house cascade
    [0, 1, 2, 3, 4, 44, 45, 46],      # spades+clubs run (Blackboard)
    [0, 14, 28, 42, 6, 20, 34, 48],   # all four suits (Flower Pot)
    [0, 1, 3, 6, 12, 13, 14, 16],     # fibonacci ranks 2 3 5 8 A
    [9, 10, 11, 12, 0, 26, 27, 28],   # broadway ranks + low diamonds
    [49, 50, 51, 36, 37, 38, 24, 25],  # clubs court (Seeing Double targets)
    [4, 5, 6, 7, 8, 18, 19, 20],      # straight ranks (flags still 0, #A36)
    [0, 13, 26, 39, 1, 14, 27, 40],   # 2222 3333 (double quads)
]


# ---------------------------------------------------------------------------
# Episode driver
# ---------------------------------------------------------------------------


def run_episode(seed, hand_ids, play_plan, shop_plan, counters, max_steps=90,
                chips0=None):
    env = make_ref(seed, hand_ids)
    ranks, suits = hand_to_rank_suit(hand_ids)
    if chips0 is not None:
        # Money surgery: vouchers cost int(600*1.15^ante) while achievable
        # income is ~$10/round + in-scoring money — in the pristine economy
        # the voucher verb is dead content. A rich episode makes it (and
        # the expensive pack kinds) live-comparable.
        env.player.chips = int(chips0)

    st = ME.reset(jax.random.key(0))
    st = st.replace(hand_rank=jnp.asarray(ranks), hand_suit=jnp.asarray(suits))
    if chips0 is not None:
        st = st.replace(chips=jnp.int32(chips0))

    forced = neutral_forced()
    forced["deal_rank"], forced["deal_suit"] = ranks, suits
    TRACE.clear()
    TRACE.update(forced)
    compare_obs(env._obs(), full_obs_ours(st), -1, f"initial (seed {seed})")

    play_i = 0
    shop_i = 0
    for t in range(max_steps):
        obs_r = env._obs()
        mask_r = np.asarray(obs_r["action_mask"], bool)
        mask_o = np.asarray(_mask_j(st), bool)
        np.testing.assert_array_equal(
            mask_o, mask_r, err_msg=f"step {t}: action_mask (seed {seed})")

        if env.phase == ref_v2.PHASE_PLAY:
            a = play_plan[play_i % len(play_plan)]
            play_i += 1
        else:
            a = None
            while a is None and shop_i < 10_000:
                token = shop_plan[shop_i % len(shop_plan)]
                shop_i += 1
                a = shop_action_for(env, st, token, counters)
                if a is not None:
                    counters[f"verb_{token}"] += 1
        if a is None:
            a = 10  # no token applicable: skip the shop

        n_jok_pre = len(env.simulator.player_state.jokers)
        obs_r2, r_r, term_r, trunc_r, info = env.step(a)
        assert len(env.simulator.player_state.jokers) <= ME.JOKER_CAP, \
            "scripts must keep the (unbounded) reference joker list within " \
            "our physical slots"

        forced = neutral_forced()
        forced["deal_rank"], forced["deal_suit"] = ranks, suits
        (forced["shop_types"], forced["shop_items"], forced["shop_costs"],
         forced["shop_n"]) = ref_shop_arrays(env)

        st, r_o, done_o = _step_forced(st, jnp.int32(a), forced)

        if a <= 5:
            counters[f"play_{a}"] += 1
        elif a <= 8:
            counters[f"discard_{a}"] += 1
        if float(r_r) < 0 and 20 <= a < 40 \
                and len(env.simulator.player_state.jokers) > n_jok_pre:
            counters["a43_witness"] += 1  # -1 step that still added a joker
        counters["steps"] += 1

        if bool(done_o):
            # Ours terminates past ante 8 (PARITY #B15); the reference
            # plays forever (step always returns terminated=False,
            # v2:203,274).
            assert not term_r and int(np.asarray(st.ante)) == 9
            compare_obs(obs_r2, full_obs_ours(st), t,
                        f"(action {a}, seed {seed})", skip=("action_mask",))
            np.testing.assert_allclose(float(r_o), float(r_r), atol=1e-6)
            counters["terminal"] += 1
            return counters

        compare_obs(obs_r2, full_obs_ours(st), t, f"(action {a}, seed {seed})")
        np.testing.assert_allclose(
            float(r_o), float(r_r), atol=1e-6,
            err_msg=f"step {t}: reward (action {a}, seed {seed})")
        assert not bool(term_r) and not bool(trunc_r)
    return counters


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("seams")
def test_macro_differential_replay_vs_live_reference():
    """500+ scripted steps across 10 planted hands: every shared obs field
    (incl. the ragged shop keys), mask, reward and done must match the live
    reference. Coverage floors: all 6 play strategies, all 3 discard macros
    (+ the exhausted-discard -1), every shop verb, the slot-8 collision,
    and the #A43 failed-buy joker append."""
    counters = defaultdict(int)
    JOKER_CYCLE.i = 0
    for ep, hand in enumerate(HANDS):
        run_episode(1000 + 7 * ep, hand,
                    PLAY_PLANS[ep % len(PLAY_PLANS)],
                    SHOP_PLANS[ep % len(SHOP_PLANS)], counters,
                    chips0=4000 if ep in (3, 7) else None)
    assert counters["steps"] >= 500, dict(counters)
    assert counters["terminal"] == len(HANDS), dict(counters)
    for m in range(6):
        assert counters[f"play_{m}"] > 0, dict(counters)
    for d in (6, 7, 8):
        assert counters[f"discard_{d}"] > 0, dict(counters)
    for v in ("pack_verb_pack", "pack_verb_joker", "pack_verb_card",
              "pack_verb_voucher", "joker_verb", "card_verb", "voucher_verb",
              "reroll", "skip", "bad_index"):
        assert counters[f"verb_{v}"] > 0, (v, dict(counters))
    assert counters["collision_armed"] > 0, dict(counters)
    assert counters["a43_witness"] > 0, dict(counters)


@pytest.mark.usefixtures("seams")
def test_macro_score_is_overwritten_by_money_live():
    """PARITY #A35 witnessed live: the reference adds the play score to
    chips and immediately overwrites chips with the scoring-state money —
    so chips move only by in-scoring money effects (Rough Gem here)."""
    hand = [26, 27, 28, 29, 30, 0, 13, 45]  # five low diamonds
    env = make_ref(77, hand)
    # Rough Gem: +$1 per scored Diamond (complete_joker_effects.py:160).
    rg = JOKER_BY_NAME["Rough Gem"]
    env.simulator.player_state.jokers.append(rg.id)
    chips_pre = env.player.chips
    obs, r, *_ = env.step(1)  # play first 5 (all diamonds)
    assert r > 0  # the score itself is large...
    assert env.player.chips == chips_pre + 5  # ...but only money lands

    ranks, suits = hand_to_rank_suit(hand)
    st = ME.reset(jax.random.key(0))
    st = st.replace(hand_rank=jnp.asarray(ranks), hand_suit=jnp.asarray(suits),
                    jokers=st.jokers.at[0].set(rg.id), joker_n=jnp.int32(1))
    forced = neutral_forced()
    forced["deal_rank"], forced["deal_suit"] = ranks, suits
    st2, r_o, _ = _step_forced(st, jnp.int32(1), forced)
    assert int(np.asarray(st2.chips)) == chips_pre + 5
    np.testing.assert_allclose(float(r_o), float(r), atol=1e-6)

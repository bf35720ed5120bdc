"""Differential replay against the LIVE reference flagship env.

Imports /root/reference/balatro_gym/balatro_env_2.BalatroEnv, steps it and
this repo's ``engine/full_env`` side by side with identical action scripts,
and asserts per-step equality of every shared observation field, the action
mask, the reward and the done flag.

Chance-node protocol (the two RNGs cannot produce identical draws —
PARITY #B2): after each reference step the harness extracts the SEMANTIC
outcomes of that step's chance draws and forces them into the JAX engine
through module-level seams, so everything downstream of a chance node is
compared exactly:

* deck order           — episode start mirrors the reference's shuffled deck
* lucky $20 rolls      — parsed from DeterministicRNG's 'card_enhancement'
                         history (balatro_env_2.py:717-724) → forced
                         ``full_env._play_rolls``
* purple-seal tarots   — 'seal_applications' choice history (:1020-1031) →
                         forced ``full_env._purple_tarot_ids``
* boss selection       — ``state.active_boss_blind`` → forced
                         ``ops.boss.select_boss``
* boss on_hand_drawn   — recorded from the live BossBlindManager (Wheel
                         face-downs, The Hook's sample, boss_blinds.py:343-378)
                         → forced ``ops.boss.on_hand_drawn``
* shop inventory       — ``state.shop_inventory`` after every step → forced
                         ``engine.shop_logic.generate_inventory``

Scoring needs no chance forcing: NO joker effect fires in the reference's
env scoring path (PARITY #A38 — the isinstance(joker_name, str) guards in
unified_scoring.py:164-221 fail on to_dict()'s dict entries), which this
suite also verifies directly (test_env_scoring_ignores_jokers_live).

Coverage: episodes plant jokers, enhanced/edition/sealed cards and
consumables by identical surgery on both sides; random-walk policies are
weighted toward play/discard/consumable/shop/blind actions. Consumables
whose effects draw RNG (and the reference-crashing ones, PARITY #B1) are
never USED by the policy, though purple seals may still mint them.

The JAX engine runs EAGERLY (monkeypatched seams don't exist under jit);
~0.7 s/step on this host — the step budget below keeps the test ~3 min.
"""
import random as pyrandom
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

ref_env_mod = pytest.importorskip("balatro_gym.balatro_env_2")

from balatro_gym.jokers import JOKER_LIBRARY  # noqa: E402
from balatro_gym.cards import CardState as RefCardState  # noqa: E402
from balatro_gym.cards import Edition as RefEdition  # noqa: E402
from balatro_gym.cards import Enhancement as RefEnhancement  # noqa: E402
from balatro_gym.cards import Seal as RefSeal  # noqa: E402

from balatro_gym_tpu.core import cards as C  # noqa: E402
from balatro_gym_tpu.engine import consumable_logic as CL  # noqa: E402
from balatro_gym_tpu.engine import full_env as fe  # noqa: E402
from balatro_gym_tpu.engine import shop_logic as SL  # noqa: E402
from balatro_gym_tpu.ops import boss as BB  # noqa: E402
from balatro_gym_tpu.ops import joker_tables as JT  # noqa: E402

# ---------------------------------------------------------------------------
# Static maps
# ---------------------------------------------------------------------------

PACK_KIND = {"Standard Pack": SL.PACK_STANDARD, "Joker Pack": SL.PACK_JOKER,
             "Tarot Pack": SL.PACK_TAROT, "Planet Pack": SL.PACK_PLANET,
             "Spectral Pack": SL.PACK_SPECTRAL}

TAROT_NAMES = ["The Fool", "The Magician", "The High Priestess", "The Empress",
               "The Emperor", "The Hierophant", "The Lovers", "The Chariot",
               "Strength", "The Hermit", "Wheel of Fortune", "Justice",
               "The Hanged Man", "Death", "Temperance", "The Devil",
               "The Tower", "The Star", "The Moon", "The Sun", "Judgement",
               "The World"]
TAROT_ID = {n: i + 1 for i, n in enumerate(TAROT_NAMES)}
PLANET_NAMES = ["Mercury", "Venus", "Earth", "Mars", "Jupiter", "Saturn",
                "Uranus", "Neptune", "Pluto", "Planet X", "Ceres", "Eris"]
NAME_TO_ID = dict(TAROT_ID)
NAME_TO_ID.update({n: 30 + i for i, n in enumerate(PLANET_NAMES)})
ID_TO_NAME = {v: k for k, v in NAME_TO_ID.items()}

# Consumables the policy may USE live: deterministic effects only (no RNG
# draws in CL/_use_consumable) and no reference crashers (PARITY #B1).
SAFE_USE_IDS = {CL.MAGICIAN, CL.EMPRESS, CL.HIEROPHANT, CL.LOVERS, CL.CHARIOT,
                CL.STRENGTH, CL.HERMIT, CL.JUSTICE, CL.DEATH, CL.TEMPERANCE,
                CL.DEVIL, CL.TOWER, CL.STAR, CL.MOON, CL.SUN, CL.WORLD} | \
    set(range(CL.PLANET_BASE, CL.PLANET_BASE + CL.NUM_PLANET))

# Action-category weights (coverage-biased legal policy).
WEIGHTS = np.ones(60)
WEIGHTS[0] = 4.0    # play
WEIGHTS[1] = 2.5    # discard
WEIGHTS[2:10] = 2.0  # select
WEIGHTS[10:15] = 6.0  # use consumable
WEIGHTS[20:30] = 3.0  # buy
WEIGHTS[30] = 4.0   # reroll
WEIGHTS[31] = 1.5   # end shop
WEIGHTS[32:37] = 2.0  # sell
WEIGHTS[45:47] = 0.5
WEIGHTS[47] = 3.0   # boss blind
WEIGHTS[48] = 0.5   # skip

FLOAT_KEYS = {"progress_ratio"}


# ---------------------------------------------------------------------------
# Forcing seams (module-level state read by the monkeypatched hooks)
# ---------------------------------------------------------------------------

class Forced:
    def __init__(self):
        self.clear()

    def clear(self):
        self.lucky_pos = []      # hand positions whose $20 roll succeeded
        self.tarot_slots = {}    # consumable slot -> forced tarot id
        self.boss_id = 1
        self.face10 = np.zeros(10, bool)
        self.hook10 = np.zeros(10, bool)
        self.shop = None         # (types, items, costs, n)


F = Forced()


def fake_play_rolls(k_eff):
    del k_eff
    rolls = np.ones((fe.SEL, 3))
    for p in F.lucky_pos:
        rolls[p, 2] = 0.0
    return jnp.asarray(rolls)


def fake_tarot_ids(k_seal):
    del k_seal
    ids = np.ones(fe.MAX_CONS, np.int32)
    for slot, tid in F.tarot_slots.items():
        if slot < fe.MAX_CONS:
            ids[slot] = tid
    return jnp.asarray(ids)


def fake_select_boss(key):
    del key
    return jnp.int32(F.boss_id)


def fake_on_hand_drawn(key, boss_id, first_hand, ranks, present):
    del key, boss_id, first_hand, ranks
    n = present.shape[0]
    return jnp.asarray(F.face10[:n]), jnp.asarray(F.hook10[:n])


def fake_generate_inventory(key, ante, owned_jokers, vouchers):
    del key, ante, owned_jokers, vouchers
    if F.shop is None:
        return (jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
                jnp.zeros(SL.SHOP_SLOTS, jnp.int32),
                jnp.zeros(SL.SHOP_SLOTS, jnp.int32), jnp.int32(0))
    t, i, c, n = F.shop
    return (jnp.asarray(t), jnp.asarray(i), jnp.asarray(c), jnp.int32(n))


@pytest.fixture
def seams(monkeypatch):
    monkeypatch.setattr(fe, "_play_rolls", fake_play_rolls)
    monkeypatch.setattr(fe, "_purple_tarot_ids", fake_tarot_ids)
    monkeypatch.setattr(BB, "select_boss", fake_select_boss)
    monkeypatch.setattr(BB, "on_hand_drawn", fake_on_hand_drawn)
    monkeypatch.setattr(SL, "generate_inventory", fake_generate_inventory)
    F.clear()
    yield F


# ---------------------------------------------------------------------------
# Reference-side helpers
# ---------------------------------------------------------------------------


def make_ref_env(seed):
    pyrandom.seed(10_000 + seed)  # boss choice / complete_joker_effects RNG
    env = ref_env_mod.BalatroEnv(seed=seed)
    obs, _ = env.reset(seed=seed)
    return env, obs


def record_on_hand_drawn(env, cap):
    orig = env.boss_blind_manager.on_hand_drawn

    def wrapper(hand_cards, game_state):
        eff = orig(hand_cards, game_state)
        cap["eff"] = eff
        return eff

    env.boss_blind_manager.on_hand_drawn = wrapper


def ref_shop_arrays(env):
    """(types, items, costs, n) in this repo's encoding from the reference's
    live inventory (shop.py:112-139 payload shapes). NB: read the live
    ``Shop.inventory`` — ``state.shop_inventory`` is a stale COPY taken at
    generation time (balatro_env_2.py:1391) that buys/rerolls never update."""
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
    return types, items, costs, len(inv)


def parse_chance(env, hist_start, sel_order, card_states_pre, hand_pre):
    """Derive forced lucky positions + purple tarot ids from the
    DeterministicRNG history delta of one reference step."""
    hist = env.rng.history[hist_start:]
    lucky_pos = []
    enh_draws = [v for (s, k, v) in hist
                 if s == "card_enhancement" and k == "float"]
    di = 0
    for pos in sel_order:
        if pos >= len(hand_pre):
            continue
        cs = card_states_pre.get(hand_pre[pos])
        if cs is None:
            continue
        if cs.enhancement == RefEnhancement.GLASS:
            di += 1  # glass-break roll; destruction is a no-op (#A5)
        elif cs.enhancement == RefEnhancement.LUCKY:
            if di + 1 < len(enh_draws):
                money_roll = enh_draws[di + 1]
                if money_roll < 0.0667:  # cards.py:172
                    lucky_pos.append(pos)
            di += 2
    tarots = [v for (s, k, v) in hist
              if s == "seal_applications" and k == "choice"]
    return lucky_pos, [TAROT_ID[t] for t in tarots]


# ---------------------------------------------------------------------------
# State mirroring / surgery
# ---------------------------------------------------------------------------


def mirror_state(env):
    """Fresh FullEnvState mirroring the reference env's post-reset (+surgery)
    state: deck order, card modifiers, jokers, consumables, money."""
    st = fe.reset(jax.random.key(0))
    n = len(env.state.deck)
    rank = np.zeros(fe.MAX_DECK, np.int32)
    suit = np.zeros(fe.MAX_DECK, np.int32)
    enh = np.zeros(fe.MAX_DECK, np.int32)
    ed = np.zeros(fe.MAX_DECK, np.int32)
    seal = np.zeros(fe.MAX_DECK, np.int32)
    alive = np.zeros(fe.MAX_DECK, bool)
    for i, card in enumerate(env.state.deck):
        rank[i] = int(card.rank)
        suit[i] = int(card.suit)
        alive[i] = True
        cs = env.state.card_states.get(i)
        if cs is not None:
            enh[i] = int(cs.enhancement)
            ed[i] = int(cs.edition)
            seal[i] = int(cs.seal)
    jok = np.zeros(fe.MAX_JOKERS, np.int32)
    for i, j in enumerate(env.state.jokers[:fe.MAX_JOKERS]):
        jok[i] = j.id
    cons = np.zeros(fe.MAX_CONS, np.int32)
    for i, name in enumerate(env.state.consumables[:fe.MAX_CONS]):
        cons[i] = NAME_TO_ID.get(name, 0)
    assert n == 52
    return st.replace(
        card_rank=jnp.asarray(rank), card_suit=jnp.asarray(suit),
        card_enh=jnp.asarray(enh), card_ed=jnp.asarray(ed),
        card_seal=jnp.asarray(seal), card_alive=jnp.asarray(alive),
        jokers=jnp.asarray(jok),
        joker_n=jnp.int32(len(env.state.jokers)),
        cons=jnp.asarray(cons),
        cons_n=jnp.int32(len(env.state.consumables)),
        money=jnp.int32(env.state.money),
    )


def surgery(env, rng, jokers, consumables, enh_rate=0.25, seal_rate=0.25,
            ed_rate=0.10, money=80):
    """Plant jokers / card modifiers / consumables / money in the REFERENCE
    env (mirror_state copies them into the JAX state afterwards)."""
    for jid in jokers:
        env.state.jokers.append(next(j for j in JOKER_LIBRARY if j.id == jid))
    env.state.consumables.extend(consumables)
    env.state.money = money
    enh_pool = [RefEnhancement.BONUS, RefEnhancement.MULT, RefEnhancement.GLASS,
                RefEnhancement.STEEL, RefEnhancement.GOLD, RefEnhancement.LUCKY,
                RefEnhancement.STONE]
    seal_pool = [RefSeal.GOLD, RefSeal.RED, RefSeal.BLUE, RefSeal.PURPLE]
    ed_pool = [RefEdition.FOIL, RefEdition.HOLOGRAPHIC, RefEdition.POLYCHROME]
    for i in range(52):
        if rng.random() < enh_rate or rng.random() < seal_rate \
                or rng.random() < ed_rate:
            cs = env.state.card_states.setdefault(i, RefCardState(i))
            if rng.random() < enh_rate * 2:
                cs.enhancement = enh_pool[rng.integers(len(enh_pool))]
            if rng.random() < seal_rate * 2:
                cs.seal = seal_pool[rng.integers(len(seal_pool))]
            if rng.random() < ed_rate * 2:
                cs.edition = ed_pool[rng.integers(len(ed_pool))]


# ---------------------------------------------------------------------------
# Comparison
# ---------------------------------------------------------------------------


def compare_obs(obs_r, obs_o, t, ctx, skip=()):
    for k in obs_r:
        if k not in obs_o or k in skip:
            continue
        a = np.asarray(obs_r[k])
        b = np.asarray(obs_o[k])
        if k in FLOAT_KEYS:
            np.testing.assert_allclose(
                b.astype(np.float64), a.astype(np.float64), atol=1e-5,
                err_msg=f"step {t}: obs[{k}] {ctx}")
        else:
            np.testing.assert_array_equal(
                b.astype(np.int64), a.astype(np.int64),
                err_msg=f"step {t}: obs[{k}] {ctx}")


def run_episode(seed, jokers, consumables, max_steps, counters):
    env, obs_r = make_ref_env(seed)
    rng = np.random.default_rng(seed * 13 + 5)
    surgery(env, rng, jokers, consumables)
    obs_r = env._get_observation()
    cap = {}
    record_on_hand_drawn(env, cap)

    st = mirror_state(env)
    compare_obs(obs_r, {k: np.asarray(v) for k, v in fe.observe(st).items()},
                -1, "initial")

    for t in range(max_steps):
        mask_r = np.asarray(obs_r["action_mask"], bool)
        mask_o = np.asarray(fe.action_mask(st), bool)
        np.testing.assert_array_equal(mask_o, mask_r,
                                      err_msg=f"step {t}: action_mask")

        # coverage-biased legal action, excluding unsafe consumable uses
        w = mask_r * WEIGHTS
        cons_now = np.asarray(st.cons)
        for ci in range(5):
            if w[10 + ci] > 0 and int(cons_now[ci]) not in SAFE_USE_IDS:
                w[10 + ci] = 0.0
        if w.sum() == 0:
            break
        a = int(rng.choice(60, p=w / w.sum()))

        # ---- reference step + chance extraction ----
        if 10 <= a < 15:
            # PARITY #B3: targeted consumables pick the first-K selected in
            # TOGGLE order; our vectorized state orders by hand position.
            # Sorting the reference's selection (obs-invisible — the obs is
            # a position mask) aligns the orders without losing coverage.
            env.state.selected_cards.sort()
        sel_order = list(env.state.selected_cards)
        hand_pre = list(env.state.hand_indexes)
        card_states_pre = dict(env.state.card_states)
        cons_n_pre = int(np.asarray(st.cons_n))
        hist_start = len(env.rng.history)
        cap.pop("eff", None)
        obs_r, r_r, term_r, trunc_r, info = env.step(a)

        F.clear()
        lucky_pos, tarot_ids = parse_chance(env, hist_start, sel_order,
                                            card_states_pre, hand_pre)
        F.lucky_pos = lucky_pos
        F.tarot_slots = {cons_n_pre + i: tid
                         for i, tid in enumerate(tarot_ids)}
        counters["lucky"] += len(lucky_pos)
        counters["purple_tarot"] += len(tarot_ids)
        if env.state.boss_blind_active and env.state.active_boss_blind:
            F.boss_id = int(env.state.active_boss_blind)
            counters["boss_steps"] += 1
        eff = cap.get("eff")
        if eff:
            for i in eff.get("face_down_cards", []):
                if i < 10:
                    F.face10[i] = True
            for i in eff.get("discarded_cards", []):
                if i < 10:
                    F.hook10[i] = True
            counters["ohd"] += 1
        F.shop = ref_shop_arrays(env)
        counters[f"act_{a // 10}"] += 1

        # ---- our step ----
        st, r_o, done_o = fe.step(st, jnp.int32(a))
        obs_o = {k: np.asarray(v) for k, v in fe.observe(st).items()}

        # On terminal steps our mask zeroes (action_mask & ~done) while the
        # reference's terminal obs still shows its phase mask — terminal obs
        # are discarded by Gym convention, so skip the mask there.
        compare_obs(obs_r, obs_o, t, f"(action {a}, seed {seed})",
                    skip=("action_mask",) if term_r else ())
        np.testing.assert_allclose(float(r_o), float(r_r), atol=1e-5,
                                   err_msg=f"step {t}: reward (action {a}, "
                                           f"seed {seed})")
        assert bool(done_o) == bool(term_r), \
            f"step {t}: done {bool(done_o)} vs {bool(term_r)} (action {a})"
        counters["steps"] += 1
        if term_r:
            break
    return counters


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

EPISODES = [
    # (seed, jokers, consumables)
    (11, [1, 31, 48, 34], ["The Magician", "The Hermit"]),
    (23, [JT.J_TRADING_CARD, JT.J_FACELESS, 113, 42],
     ["Mercury", "The Devil"]),
    (37, [JT.J_FOUR_FINGERS, JT.J_SHORTCUT, JT.J_JOLLY],
     ["The Tower", "Jupiter"]),
    (51, [JT.J_MISPRINT, JT.J_BLOODSTONE, JT.J_SCARY_FACE],
     ["The Chariot", "Temperance"]),
    (64, [61, 72, 140], ["Justice", "The Empress"]),
]


@pytest.mark.usefixtures("seams")
def test_differential_replay_vs_live_reference():
    """220+ mixed-phase steps across 5 planted episodes: every shared obs
    field, mask, reward and done must match the live reference exactly."""
    from collections import defaultdict

    counters = defaultdict(int)
    for seed, jokers, consumables in EPISODES:
        run_episode(seed, jokers, consumables, max_steps=48,
                    counters=counters)
    assert counters["steps"] >= 150, dict(counters)
    # Coverage floors: chance-forcing machinery and phase breadth all hit.
    assert counters["boss_steps"] > 0, dict(counters)
    assert counters["act_0"] > 0      # play-phase actions
    assert counters["act_2"] > 0 or counters["act_3"] > 0  # shop actions
    assert counters["act_4"] > 0      # blind actions


@pytest.mark.usefixtures("seams")
def test_env_scoring_ignores_jokers_live():
    """PARITY #A38 witnessed live: planting a flat +4-mult Joker changes
    NOTHING about the reference's play score — and our engine agrees."""
    def run(with_joker):
        env, _ = make_ref_env(42)
        if with_joker:
            surgery(env, np.random.default_rng(0), [1], [],
                    enh_rate=0, seal_rate=0, ed_rate=0, money=4)
        st = mirror_state(env)
        for a in (45, 2, 3):
            obs, r, *_ = env.step(a)
            st, r_o, _ = fe.step(st, jnp.int32(a))
        obs, r, term, trunc, info = env.step(0)
        st, r_o, _ = fe.step(st, jnp.int32(0))
        return info["final_score"], int(np.asarray(st.round_chips_scored))

    s_ref0, s_our0 = run(False)
    s_ref1, s_our1 = run(True)
    assert s_ref0 == s_ref1, "reference env DOES apply jokers?!"
    assert s_our0 == s_ref0 and s_our1 == s_ref1

"""ScoreEngine / BalatroSimulator facades (reference API surface)."""
from balatro_gym_tpu.engine.simulator import BalatroSimulator, ScoreEngine


def test_score_engine_levels():
    e = ScoreEngine()
    assert e.get_hand_chips_mult(0) == (5, 1)
    assert e.get_hand_chips_mult(11) == (160, 16)
    e.apply_planet(0)
    assert e.get_hand_chips_mult(0) == (15, 2)
    e.apply_planet_by_name("Eris")
    assert e.get_hand_chips_mult(11) == (170, 17)


def test_score_engine_score_hand():
    e = ScoreEngine()
    # Lone ace: (5 + 11) * 1 (scoring_engine.py simple path).
    assert e.score_hand([(14, 3)]) == 16


def test_simulator_evaluate_hand():
    sim = BalatroSimulator()
    r = sim.evaluate_hand([(9, 0), (9, 1), (4, 2), (4, 3), (11, 0)])
    assert r["top"] == "Two Pair"
    assert len(r["Pair"]) == 2
    assert r["scoring_cards"] == [0, 1, 2, 3]


def test_simulator_calculate_score_golden():
    sim = BalatroSimulator()
    score, info = sim.calculate_score([(r, 3) for r in (10, 11, 12, 13, 14)])
    assert score == 1208
    assert info["hand_type"] == "Straight Flush"


def test_simulator_with_jokers():
    sim = BalatroSimulator(jokers=[1])  # Joker: +4 mult
    score, _ = sim.calculate_score([(14, 3)])
    assert score == (5 + 11) * (1 + 4)

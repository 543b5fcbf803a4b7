"""Golden tests for the reward subsystem.

Expected values were produced by executing the reference implementation
(train/stage_rl/reward.py + reward_process/) on the same inputs, then
hardcoded here; the TPU build must reproduce them bit-for-bit.
"""

import pytest

from iadr1_tpu.rewards import (
    accuracy_reward,
    consistency_reward,
    consistency_reward_cot,
    accuracy_reward_cot_base,
    format_reward_cot_base,
    wo_format,
    get_reward_funcs,
    location_cell,
    location_score,
    type_score,
)

def conv(s):
    return [{"role": "assistant", "content": s}]


TYPE_GOLDENS = [
    ("scratch", "scratch", 1.0),
    ("scratch mark", "scratch", 0.85),
    ("linear scratch", "surface scratch", 0.85),
    ("a small scratch", "scratch", 0.85),
    ("dirt", "stain", 0.85),
    ("hole", "opening", 0.85),
    ("perforation", "crack", 0.0),
    ("crack", "fracture", 0.0),
    ("dent", "deformation", 0.0),
    ("scratch", "hole", 0.0),
    ("surface anomaly", "scratch", 0.3),
    ("scratch", "structural anomaly", 0.0),
    ("surface anomalies", "structural anomalies", 0.0),
    ("", "scratch", 0.0),
    ("scratch", "", 0.0),
    ("scrach", "scratch", 0.8307692307692307),
    ("missing part", "gap", 0.85),
    ("bent component", "warping", 0.85),
    ("foreign object", "debris", 0.85),
    ("wear", "abrasion", 0.85),
    ("broken", "breakage", 0.0),
    ("contamination", "surface contamination", 0.85),
    ("weird thing", "blob", 0.0),
    ("blob", "blobby", 0.85),
    ("damage", "structural damage", 0.85),
    ("hole", "void", 0.85),
    ("surface scratch on metal", "scratch", 0.85),
    ("color anomaly", "stain", 0.85),
    ("puncture", "surface scratch", 0.0),
    ("structural anomaly", "hole", 0.3),
]


@pytest.mark.parametrize("pred,actual,expected", TYPE_GOLDENS)
def test_type_score_golden(pred, actual, expected):
    assert type_score(pred, actual) == pytest.approx(expected, abs=1e-12)


LOCATION_GOLDENS = [
    ("top left", "upper left", 1),
    ("top-left corner", "left top", 1),
    ("center", "middle", 1),
    ("left side", "left", 1),
    ("bottom right", "lower right", 1),
    ("top", "bottom", 0),
    ("the upper part", "top area", 1),
    ("right", "left", 0),
    ("center of image", "the middle region", 1),
    ("bottom left corner", "lower-left", 1),
    ("somewhere", "center", 1),
    ("top right", "top", 0),
]


@pytest.mark.parametrize("pred,actual,expected", LOCATION_GOLDENS)
def test_location_score_golden(pred, actual, expected):
    assert location_score(pred, actual) == expected


def test_location_cells():
    assert location_cell("center") == 5
    assert location_cell("top left") == 1
    assert location_cell("bottom right corner") == 9
    assert location_cell("upper") == 2
    assert location_cell("lower left") == 7


CONSISTENCY_GOLDENS = [
    ("<think>x</think><answer>No</answer>", "<answer>no</answer>", 1.0),
    ("<think>x</think><answer>No</answer>", "<answer>yes</answer>", 0.0),
    ("<think>x</think><location>top</location><type>scratch</type><answer>Yes</answer>",
     "<answer>yes</answer>", 1.0),
    ("<think>x</think><location>top</location><type>scratch</type><answer>Yes</answer>",
     "<answer>no</answer>", 0.0),
    # tag order matters: type before location fails
    ("<think>x</think><type>scratch</type><location>top</location><answer>Yes</answer>",
     "<answer>yes</answer>", 0.0),
    # separator between adjacent tags fails
    ("<think>x</think>\n<answer>no</answer>", "<answer>no</answer>", 0.0),
    # leading/trailing junk is tolerated
    ("prefix <think>x</think><answer>no</answer> suffix", "<answer>no</answer>", 1.0),
    # missing think fails
    ("<answer>no</answer>", "<answer>no</answer>", 0.0),
    # a location tag anywhere poisons the "no" pattern
    ("<think>a<location>l</location>b</think><answer>no</answer>",
     "<answer>no</answer>", 0.0),
    # empty payloads are fine
    ("<think>x</think><location></location><type></type><answer>yes</answer>",
     "<answer>yes</answer>", 1.0),
]


@pytest.mark.parametrize("content,sol,expected", CONSISTENCY_GOLDENS)
def test_consistency_golden(content, sol, expected):
    assert consistency_reward([conv(content)], [sol]) == [expected]


ACCURACY_GOLDENS = [
    ("<think>x</think><answer>no</answer>", "<answer>no</answer>", 1.0),
    ("<think>x</think><answer>yes</answer>", "<answer>no</answer>", 0.0),
    ("<think>x</think><location>top left</location><type>scratch</type><answer>yes</answer>",
     "<think>g</think><location>upper left</location><type>scratch</type><answer>yes</answer>",
     2.0),
    ("<think>x</think><location>bottom</location><type>hole</type><answer>yes</answer>",
     "<think>g</think><location>top</location><type>scratch</type><answer>yes</answer>",
     1.0),
    ("<think>x</think><answer>yes</answer>",
     "<think>g</think><location>top</location><type>scratch</type><answer>yes</answer>",
     1.0),
    # partial credit accrues even with the wrong verdict
    ("<think>x</think><location>top</location><type>dirt</type><answer>no</answer>",
     "<think>g</think><location>top</location><type>stain</type><answer>yes</answer>",
     0.925),
    ("no answer tags at all", "<answer>no</answer>", 0.0),
    ("<answer>NO</answer>", "<answer>No</answer>", 1.0),
    ("<think>x</think><location>center</location><type>surface contamination</type><answer>yes</answer>",
     "<think>g</think><location>middle</location><type>stain</type><answer>yes</answer>",
     1.925),
]


@pytest.mark.parametrize("content,sol,expected", ACCURACY_GOLDENS)
def test_accuracy_golden(content, sol, expected):
    got = accuracy_reward([conv(content)], [sol])
    assert got == pytest.approx([expected], abs=1e-12)


def test_batch_shapes():
    contents = ["<think>a</think><answer>no</answer>"] * 3
    sols = ["<answer>no</answer>"] * 3
    comps = [conv(c) for c in contents]
    assert consistency_reward(comps, sols) == [1.0, 1.0, 1.0]
    assert accuracy_reward(comps, sols) == [1.0, 1.0, 1.0]


def test_registry():
    funcs = get_reward_funcs(["accuracy", "format"])
    assert funcs[0] is accuracy_reward
    assert funcs[1] is consistency_reward


def test_cot_consistency_grading():
    sol = "<answer>yes</answer>"
    full = "<think>t</think><location>l</location><type>y</type><description>d</description><answer>yes</answer>"
    two = "<think>t</think><location>l</location><type>y</type><answer>yes</answer>"
    one = "<think>t</think><type>y</type><answer>yes</answer>"
    none = "<think>t</think><answer>yes</answer>"
    wrong = "<think>t</think><answer>no</answer>"
    comps = [conv(c) for c in (full, two, one, none, wrong)]
    assert consistency_reward_cot(comps, [sol] * 5) == [1.0, 0.7, 0.4, 0.0, 0.0]
    # gt "no": any tag poisons
    sol_no = "<answer>no</answer>"
    clean = "<think>t</think><answer>no</answer>"
    dirty = "<think>t</think><type>y</type><answer>no</answer>"
    assert consistency_reward_cot([conv(clean), conv(dirty)], [sol_no] * 2) == [1.0, 0.0]


def test_base_rewards():
    assert format_reward_cot_base([conv("<think>a</think><answer>no</answer>")], ["x"]) == [1.0]
    assert format_reward_cot_base([conv("<answer>no</answer>")], ["x"]) == [0.0]
    assert accuracy_reward_cot_base(
        [conv("<think>a</think><answer>Yes</answer>")], ["<answer>yes</answer>"]
    ) == [1.0]
    assert wo_format([conv("x")], ["y"]) == 0

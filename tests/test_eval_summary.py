"""Tests for the MCQ parser, answer extractor, and accuracy summarizer."""

import pytest

from iadr1_tpu.eval.mcq import parse_conversation, extract_option_answer
from iadr1_tpu.eval.summary import summarize_answers


SAMPLE = {
    "image_path": "DAGM/Class2/good/0116.PNG",
    "conversation": [
        {
            "Answer": "B",
            "Options": {"A": "Yes.", "B": "No."},
            "Question": "Are there any defects in the query image?",
            "type": "Anomaly Detection",
        }
    ],
    "similar_templates": [],
    "random_templates": [],
}


def test_parse_conversation():
    qs = parse_conversation(SAMPLE)
    assert len(qs) == 1
    q = qs[0]
    assert q.answer == "B"
    assert q.options == {"A": "Yes.", "B": "No."}
    assert q.question_type == "Anomaly Detection"
    assert q.text == "Question 1: Are there any defects in the query image? \nA. Yes.\nB. No.\n"


def test_parse_conversation_remaps_letters():
    sample = {
        "conversation": [
            {
                "Answer": "C",
                "Options": {"B": "first", "C": "second"},
                "Question": "q?",
                "type": "Other",
            }
        ]
    }
    q = parse_conversation(sample)[0]
    # options re-lettered A, B in insertion order; answer C -> B
    assert q.options == {"A": "first", "B": "second"}
    assert q.answer == "B"


OPTIONS = {"A": "Yes.", "B": "No."}


@pytest.mark.parametrize(
    "response,expected",
    [
        ("<think>t</think><answer>No</answer>", "B"),
        ("<think>t</think><answer>yes</answer>", "A"),
        ("<answer>no defects found</answer>", "B"),     # substring fallback
        ("<answer>maybe</answer>", "E"),                  # no match
        ("no tags here", "E"),                            # missing tag
        ("<answer>NO.</answer>", "B"),                    # period stripped
    ],
)
def test_extract_option_answer(response, expected):
    assert extract_option_answer(response, OPTIONS) == expected


def _rec(image, qt, gpt, correct):
    return {
        "image": image,
        "question_type": qt,
        "gpt_answer": gpt,
        "correct_answer": correct,
    }


def test_balanced_accuracy():
    # 2 normal (1 correct), 2 abnormal (2 correct)
    answers = [
        _rec("DAGM/c/good/1.png", "Anomaly Detection", "B", "B"),
        _rec("DAGM/c/good/2.png", "Anomaly Detection", "A", "B"),
        _rec("DAGM/c/bad/3.png", "Anomaly Detection", "A", "A"),
        _rec("DAGM/c/bad/4.png", "Anomaly Detection", "A", "A"),
    ]
    df = summarize_answers(answers)
    # balanced acc = (0.5 + 1.0)/2 * 100 = 75, NOT raw 3/4=75... use asymmetric data
    assert df.at["DAGM", "Anomaly Detection"] == pytest.approx(75.0)

    # asymmetric: 3 normal (3 correct), 1 abnormal (0 correct)
    answers = [
        _rec("VisA/c/good/1.png", "Anomaly Detection", "B", "B"),
        _rec("VisA/c/good/2.png", "Anomaly Detection", "B", "B"),
        _rec("VisA/c/good/3.png", "Anomaly Detection", "B", "B"),
        _rec("VisA/c/bad/4.png", "Anomaly Detection", "B", "A"),
    ]
    df = summarize_answers(answers)
    # raw accuracy would be 75; balanced = (1.0 + 0.0)/2*100 = 50
    assert df.at["VisA", "Anomaly Detection"] == pytest.approx(50.0)


def test_type_aliasing_and_average_row():
    answers = [
        _rec("DS/c/good/1.png", "Object Structure", "A", "A"),
        _rec("DS/c/good/2.png", "Object Details", "A", "B"),
        _rec("DS/c/good/3.png", "Other", "A", "A"),
    ]
    df = summarize_answers(answers)
    assert "Object Analysis" in df.columns
    assert "Object Structure" not in df.columns
    assert df.at["DS", "Object Analysis"] == pytest.approx(50.0)
    assert "Average" in df.index and "Average" in df.columns


def test_invalid_letters_dropped():
    answers = [
        _rec("DS/c/good/1.png", "Other", "A", "A"),
        _rec("DS/c/good/2.png", "Other", "some long text", "A"),
    ]
    df = summarize_answers(answers)
    assert df.at["DS", "Other"] == pytest.approx(100.0)


def test_overkill_miss():
    answers = [
        _rec("DS/c/good/1.png", "Anomaly Detection", "B", "B"),
        _rec("DS/c/good/2.png", "Anomaly Detection", "A", "B"),
        _rec("DS/c/bad/3.png", "Anomaly Detection", "B", "A"),
        _rec("DS/c/bad/4.png", "Anomaly Detection", "A", "A"),
    ]
    df = summarize_answers(answers, show_overkill_miss=True)
    assert df.at["DS", "Overkill"] == pytest.approx(50.0)
    assert df.at["DS", "Miss"] == pytest.approx(50.0)


def test_mvtec_per_class_summary():
    from iadr1_tpu.eval.summary import summarize_mvtec_per_class

    answers = []
    for cls in ("bottle", "cable"):
        for i in range(4):
            normal = i % 2 == 0
            img = f"mvtec/{cls}/{'good' if normal else 'broken'}/{i}.png"
            for qn in range(1, 6):
                answers.append({
                    "image": img, "class": cls,
                    "question": {"text": f"Question {qn}: q?"},
                    "correct_answer": "A",
                    "gpt_answer": "A" if qn == 1 else "B",
                })
    df = summarize_mvtec_per_class(answers)
    # question 1 always correct -> Existence 1.0, Overkill/Miss 0
    assert df.at["bottle", "Existence"] == pytest.approx(1.0)
    assert df.at["bottle", "Overkill"] == pytest.approx(0.0)
    assert df.at["bottle", "Miss"] == pytest.approx(0.0)
    # anomalous questions 2-4 always wrong
    assert df.at["cable", "Defect Type"] == pytest.approx(0.0)
    assert "Average" in df.index

"""Per-dataset x question-type accuracy summaries.

The headline metric is balanced accuracy for the "Anomaly Detection"
question type: mean(normal_acc, abnormal_acc) x 100, where a sample is
"normal" iff ``normal_flag`` appears in its image path.  Output is a
DataFrame / CSV laid out exactly like the reference artifacts under
supplementary_results/ (rows = datasets + "Average", columns = question
types + "Average" [+ "Overkill", "Miss"]).

Behavior-compatible with ``caculate_accuracy_mmad`` in the reference
(helper/summary.py:8-124); the balanced-accuracy formula is at :88-92.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import pandas as pd

VALID_LETTERS = frozenset("ABCDE")

# Question-type aliasing (helper/summary.py:19-20).
_TYPE_ALIASES = {
    "Object Structure": "Object Analysis",
    "Object Details": "Object Analysis",
}


def _canon_type(question_type: str) -> str:
    return _TYPE_ALIASES.get(question_type, question_type)


def summarize_answers(
    answers: Iterable[dict],
    normal_flag: str = "good",
    show_overkill_miss: bool = False,
) -> pd.DataFrame:
    """Build the accuracy table from answer records.

    Each record needs ``image`` (path whose first component is the dataset
    name), ``question_type``, ``gpt_answer`` and ``correct_answer`` (option
    letters).  Records with out-of-range letters are dropped, as in the
    reference.
    """
    answers = [
        a
        for a in answers
        if a["correct_answer"] in VALID_LETTERS and a["gpt_answer"] in VALID_LETTERS
    ]

    dataset_names: list[str] = []
    type_list: list[str] = []
    for a in answers:
        ds = a["image"].split("/")[0]
        qt = _canon_type(a["question_type"])
        if ds not in dataset_names:
            dataset_names.append(ds)
        if qt not in type_list:
            type_list.append(qt)

    stats = {
        ds: {qt: {"total": 0, "correct": 0} for qt in type_list}
        for ds in dataset_names
    }
    detect = {
        ds: {
            "normal": {"total": 0, "correct": 0},
            "abnormal": {"total": 0, "correct": 0},
        }
        for ds in dataset_names
    }

    for a in answers:
        ds = a["image"].split("/")[0]
        qt = _canon_type(a["question_type"])
        correct = a["correct_answer"] == a["gpt_answer"]
        stats[ds][qt]["total"] += 1
        stats[ds][qt]["correct"] += int(correct)
        if qt == "Anomaly Detection":
            bucket = "normal" if normal_flag in a["image"] else "abnormal"
            detect[ds][bucket]["total"] += 1
            detect[ds][bucket]["correct"] += int(correct)

    df = pd.DataFrame(index=dataset_names)
    for ds in dataset_names:
        for qt in type_list:
            total = stats[ds][qt]["total"]
            acc = stats[ds][qt]["correct"] / total if total else 0
            df.at[ds, qt] = acc * 100
            if qt == "Anomaly Detection":
                d = detect[ds]
                normal_acc = (
                    d["normal"]["correct"] / d["normal"]["total"]
                    if d["normal"]["total"]
                    else 0
                )
                anomaly_acc = (
                    d["abnormal"]["correct"] / d["abnormal"]["total"]
                    if d["abnormal"]["total"]
                    else 0
                )
                # Balanced accuracy replaces the raw AD accuracy.
                df.at[ds, qt] = (normal_acc + anomaly_acc) / 2 * 100

    df["Average"] = df.mean(axis=1)

    if show_overkill_miss:
        for ds in dataset_names:
            d = detect[ds]
            normal_acc = (
                d["normal"]["correct"] / d["normal"]["total"]
                if d["normal"]["total"]
                else 0
            )
            anomaly_acc = (
                d["abnormal"]["correct"] / d["abnormal"]["total"]
                if d["abnormal"]["total"]
                else 0
            )
            df.at[ds, "Overkill"] = (1 - normal_acc) * 100
            df.at[ds, "Miss"] = (1 - anomaly_acc) * 100

    df.loc["Average"] = df.mean()
    return df


def summarize_mvtec_per_class(
    answers: Iterable[dict], normal_flag: str = "good"
) -> pd.DataFrame:
    """Per-class MVTec-style accuracy table.

    Behavior-compatible with the reference's ``caculate_accuracy``
    (helper/summary.py:126-267): questions are numbered 1..5 per image
    (parsed from "Question N" in the text, else by position), anomalous
    images map them to [Existence, Defect Type, Defect Location, Defect
    Appearance, Other] while normal images map 1 -> Existence and the rest
    to Other; rows are classes plus an Average row; Overkill/Miss come from
    question 1.
    """
    anomaly_labels = ["Existence", "Defect Type", "Defect Location",
                      "Defect Appearance", "Other"]
    normal_labels = ["Existence", "Other", "Other", "Other", "Other"]
    labels = ["Existence", "Defect Type", "Defect Location",
              "Defect Appearance", "Other"]

    stats: dict = {}
    q1: dict = {}

    def _bucket(cls):
        if cls not in stats:
            stats[cls] = {l: {"total": 0, "correct": 0} for l in labels}
            q1[cls] = {
                "normal": {"total": 0, "correct": 0},
                "anomaly": {"total": 0, "correct": 0},
            }

    last_image, q_num = "", 1
    for a in answers:
        cls = a["class"]
        _bucket(cls)
        text = a.get("question", {}).get("text", "") if isinstance(
            a.get("question"), dict) else str(a.get("question", ""))
        if "Question" in text:
            q_num = int(text.split("Question")[1].strip()[0])
        elif a["image"] == last_image:
            q_num += 1
        else:
            q_num = 1
        last_image = a["image"]
        if a["correct_answer"] not in VALID_LETTERS or \
                a["gpt_answer"] not in VALID_LETTERS:
            continue
        normal = normal_flag in a["image"]
        label = (normal_labels if normal else anomaly_labels)[q_num - 1]
        correct = a["correct_answer"] == a["gpt_answer"]
        stats[cls][label]["total"] += 1
        stats[cls][label]["correct"] += int(correct)
        if q_num == 1:
            bucket = q1[cls]["normal" if normal else "anomaly"]
            bucket["total"] += 1
            bucket["correct"] += int(correct)

    df = pd.DataFrame(index=list(stats))
    for cls in stats:
        for label in labels:
            t = stats[cls][label]["total"]
            df.at[cls, label] = stats[cls][label]["correct"] / t if t else 0
    df["Average"] = df.mean(axis=1)
    for cls in stats:
        n, an = q1[cls]["normal"], q1[cls]["anomaly"]
        normal_acc = n["correct"] / n["total"] if n["total"] else 0
        anomaly_acc = an["correct"] / an["total"] if an["total"] else 0
        df.at[cls, "Overkill"] = 1 - normal_acc
        df.at[cls, "Miss"] = 1 - anomaly_acc
    df.loc["Average"] = df.mean()
    return df


def summarize_answers_file(
    answers_json_path: str,
    normal_flag: str = "good",
    show_overkill_miss: bool = False,
    save_heatmap: bool = False,
) -> pd.DataFrame:
    """Reference-CLI-compatible entry: read answers JSON, write the
    ``*_accuracy.csv`` sibling, optionally render the heatmap PNG."""
    with open(answers_json_path) as f:
        answers = json.load(f)
    df = summarize_answers(answers, normal_flag, show_overkill_miss)

    csv_path = answers_json_path.replace(".json", "_accuracy.csv")
    df.to_csv(csv_path)

    if save_heatmap:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        plt.figure(figsize=(10, 7))
        sns.heatmap(df, annot=True, cmap="coolwarm", fmt=".1f", vmax=100, vmin=25)
        title = os.path.split(answers_json_path)[-1].replace(".json", "")
        plt.title(f"Accuracy of {title}")
        plt.xticks(rotation=30, ha="right")
        plt.tight_layout()
        plt.savefig(answers_json_path.replace(".json", "_accuracy.png"))
        plt.close()
    return df

"""Classification-report text format: writer and parser.

The report text file is the machine-readable API between the evaluation layer
and the comparison tool — `compare_models.py` regex-parses "Overall Accuracy",
"SNR +N dB" and the sklearn per-class table out of it (ref:
compare_models.py:33-60 consuming the format written by
ViT/training/utils.py:384-401). Both sides are implemented here so the format
can't drift.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def write_classification_report(
    path: str | Path,
    prefix: str,
    overall_accuracy: float,
    snr_accuracies: Dict[int, float],
    labels: np.ndarray,
    preds: np.ndarray,
    class_names: List[str],
) -> Path:
    """Write the exact reference report format (utils.py:384-401):

        Classification Report - Test Set
        ================= (80 chars) =====

        Overall Accuracy: 62.02%

        Accuracy by SNR:
          SNR  -8 dB: 13.44%
          ...

        ================================

        <sklearn classification_report, digits=4>

    Accuracies are fractions in [0, 1].
    """
    from sklearn.metrics import classification_report

    # labels= pins the report to ALL configured classes: without it sklearn
    # raises when a class is absent from a (small) split — a latent crash
    # the reference shares (utils.py:384-389 passes target_names only).
    # Byte-identical to the reference format whenever every class appears.
    report = classification_report(labels, preds,
                                   labels=np.arange(len(class_names)),
                                   target_names=class_names, digits=4,
                                   zero_division=0)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write(f"Classification Report - {prefix.capitalize()} Set\n")
        f.write("=" * 80 + "\n\n")
        f.write(f"Overall Accuracy: {overall_accuracy * 100:.2f}%\n\n")
        f.write("Accuracy by SNR:\n")
        for snr, acc in snr_accuracies.items():
            f.write(f"  SNR {snr:+3d} dB: {acc * 100:.2f}%\n")
        f.write("\n" + "=" * 80 + "\n\n")
        f.write(report)
    return path


class ClassificationReportParser:
    """Regex parser for report text files (ref: compare_models.py:23-60).

    Exposes overall_accuracy / snr_accuracies in PERCENT (as the reference
    does) and per-class precision/recall/f1/support. The class-name regex is
    widened to also match hyphenated names like AM-SSB-WC (the reference's
    `\\w+` silently dropped them — SURVEY.md §2.6 notes the limitation).
    """

    def __init__(self, report_path: str | Path):
        self.report_path = Path(report_path)
        self.overall_accuracy: Optional[float] = None
        self.snr_accuracies: Dict[int, float] = {}
        self.class_metrics: Dict[str, Dict[str, float]] = {}
        self.parse_report()

    def parse_report(self) -> None:
        content = self.report_path.read_text()

        overall = re.search(r"Overall Accuracy:\s+([\d.]+)%", content)
        if overall:
            self.overall_accuracy = float(overall.group(1))

        for snr, acc in re.findall(r"SNR\s+([-+]\d+)\s+dB:\s+([\d.]+)%", content):
            self.snr_accuracies[int(snr)] = float(acc)

        class_pattern = r"^\s*([\w-]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+(\d+)\s*$"
        for line in content.split("\n"):
            match = re.match(class_pattern, line)
            if match:
                name, precision, recall, f1, support = match.groups()
                if name not in ("accuracy", "macro", "weighted"):
                    self.class_metrics[name] = {
                        "precision": float(precision),
                        "recall": float(recall),
                        "f1-score": float(f1),
                        "support": int(support),
                    }

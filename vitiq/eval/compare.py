"""Cross-arm comparison harness.

Re-implements the reference's `compare_models.py` (ref: compare_models.py:63-396):
parses two classification-report text files (ViT arm vs raw-IQ arm), emits

  summary_comparison.csv    overall + per-SNR accuracy table with differences
  detailed_comparison.csv   per-class precision/recall/F1 side-by-side
  snr_comparison.png        grouped bars across SNR levels
  per_class_metrics.png     per-class metric bars
  f1_difference_heatmap.png F1 delta per class
  overall_comparison.png    4-panel summary
  printed key insights      (top improved / degraded classes)
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from vitiq.eval.report import ClassificationReportParser


class ModelComparison:
    """Comparison between two evaluated models from their report files."""

    def __init__(
        self,
        vit_report_path: str | Path,
        transformer_report_path: str | Path,
        output_dir: str | Path = "comparison_results",
        vit_name: str = "ViT (Vision Transformer)",
        transformer_name: str = "Transformer (Raw IQ)",
    ):
        self.vit_parser = ClassificationReportParser(vit_report_path)
        self.transformer_parser = ClassificationReportParser(transformer_report_path)
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.vit_name = vit_name
        self.transformer_name = transformer_name

    # ---- tables ----------------------------------------------------------
    def create_summary_table(self):
        """Overall + target-SNR accuracy rows with Difference / Improvement %
        (ref: compare_models.py:76-99)."""
        import pandas as pd

        rows = {
            "Metric": ["Overall Accuracy (%)", "SNR -8 dB (%)", "SNR 0 dB (%)", "SNR +8 dB (%)"],
            self.vit_name: [
                self.vit_parser.overall_accuracy,
                self.vit_parser.snr_accuracies.get(-8, 0),
                self.vit_parser.snr_accuracies.get(0, 0),
                self.vit_parser.snr_accuracies.get(8, 0),
            ],
            self.transformer_name: [
                self.transformer_parser.overall_accuracy,
                self.transformer_parser.snr_accuracies.get(-8, 0),
                self.transformer_parser.snr_accuracies.get(0, 0),
                self.transformer_parser.snr_accuracies.get(8, 0),
            ],
        }
        df = pd.DataFrame(rows)
        df["Difference"] = df[self.transformer_name] - df[self.vit_name]
        df["Improvement (%)"] = (df["Difference"] / df[self.vit_name] * 100).round(2)
        return df

    def create_detailed_comparison_table(self):
        """Per-class metric table with F1 Diff column (19 rows on the
        reference's split — ref: comparison_results/detailed_comparison.csv)."""
        import pandas as pd

        common = [c for c in self.vit_parser.class_metrics
                  if c in self.transformer_parser.class_metrics]
        rows = []
        for cls in common:
            v = self.vit_parser.class_metrics[cls]
            t = self.transformer_parser.class_metrics[cls]
            rows.append({
                "Modulation": cls,
                "ViT Precision": v["precision"] * 100,
                "ViT Recall": v["recall"] * 100,
                "ViT F1": v["f1-score"] * 100,
                "Trans Precision": t["precision"] * 100,
                "Trans Recall": t["recall"] * 100,
                "Trans F1": t["f1-score"] * 100,
                "F1 Diff": (t["f1-score"] - v["f1-score"]) * 100,
                "Support": v["support"],
            })
        return pd.DataFrame(rows)

    # ---- plots -----------------------------------------------------------
    def plot_snr_comparison(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        snr_values = sorted(self.vit_parser.snr_accuracies)
        vit = [self.vit_parser.snr_accuracies[s] for s in snr_values]
        trans = [self.transformer_parser.snr_accuracies.get(s, 0) for s in snr_values]
        x = np.arange(len(snr_values))
        width = 0.35
        fig, ax = plt.subplots(figsize=(10, 6))
        ax.bar(x - width / 2, vit, width, label=self.vit_name, alpha=0.8)
        ax.bar(x + width / 2, trans, width, label=self.transformer_name, alpha=0.8)
        ax.set_xlabel("SNR (dB)", fontsize=12, fontweight="bold")
        ax.set_ylabel("Accuracy (%)", fontsize=12, fontweight="bold")
        ax.set_title("Accuracy Comparison Across Different SNR Levels",
                     fontsize=14, fontweight="bold")
        ax.set_xticks(x)
        ax.set_xticklabels([f"{s:+d}" for s in snr_values])
        ax.legend(fontsize=10)
        ax.grid(True, axis="y", alpha=0.3)
        fig.tight_layout()
        fig.savefig(self.output_dir / "snr_comparison.png", dpi=300, bbox_inches="tight")
        plt.close(fig)

    def plot_per_class_metrics(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        df = self.create_detailed_comparison_table()
        if df.empty:
            return
        x = np.arange(len(df))
        width = 0.35
        fig, axes = plt.subplots(3, 1, figsize=(16, 14), sharex=True)
        for ax, metric in zip(axes, ("Precision", "Recall", "F1")):
            ax.bar(x - width / 2, df[f"ViT {metric}"], width, label=self.vit_name, alpha=0.8)
            ax.bar(x + width / 2, df[f"Trans {metric}"], width,
                   label=self.transformer_name, alpha=0.8)
            ax.set_ylabel(f"{metric} (%)")
            ax.legend(fontsize=9)
            ax.grid(True, axis="y", alpha=0.3)
        axes[-1].set_xticks(x)
        axes[-1].set_xticklabels(df["Modulation"], rotation=45, ha="right")
        fig.suptitle("Per-Class Metric Comparison", fontsize=14, fontweight="bold")
        fig.tight_layout()
        fig.savefig(self.output_dir / "per_class_metrics.png", dpi=300, bbox_inches="tight")
        plt.close(fig)

    def plot_f1_difference_heatmap(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        df = self.create_detailed_comparison_table()
        if df.empty:
            return
        data = df[["F1 Diff"]].T
        fig, ax = plt.subplots(figsize=(16, 3))
        sns.heatmap(data, annot=True, fmt=".1f", center=0, cmap="RdYlGn",
                    xticklabels=df["Modulation"], yticklabels=["F1 Diff (%)"], ax=ax)
        ax.set_title("F1-Score Difference (Transformer - ViT) by Modulation",
                     fontweight="bold")
        fig.tight_layout()
        fig.savefig(self.output_dir / "f1_difference_heatmap.png", dpi=300,
                    bbox_inches="tight")
        plt.close(fig)

    def plot_overall_comparison(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        df = self.create_detailed_comparison_table()
        summary = self.create_summary_table()
        fig, axes = plt.subplots(2, 2, figsize=(15, 12))
        # (1) overall + SNR bars
        ax1 = axes[0, 0]
        x = np.arange(len(summary))
        width = 0.35
        ax1.bar(x - width / 2, summary[self.vit_name], width, label="ViT", alpha=0.8)
        ax1.bar(x + width / 2, summary[self.transformer_name], width,
                label="Transformer", alpha=0.8)
        ax1.set_xticks(x)
        ax1.set_xticklabels(summary["Metric"], rotation=20, ha="right", fontsize=8)
        ax1.set_ylabel("Accuracy (%)")
        ax1.set_title("Summary Metrics", fontweight="bold")
        ax1.legend()
        # (2) F1 scatter
        ax2 = axes[0, 1]
        if not df.empty:
            ax2.scatter(df["ViT F1"], df["Trans F1"], alpha=0.7)
            lim = [0, 100]
            ax2.plot(lim, lim, "k--", alpha=0.5)
            ax2.set_xlabel("ViT F1 (%)")
            ax2.set_ylabel("Transformer F1 (%)")
        ax2.set_title("Per-Class F1: Transformer vs ViT", fontweight="bold")
        # (3) F1 diff bars
        ax3 = axes[1, 0]
        if not df.empty:
            order = df.sort_values("F1 Diff")
            colors = ["#e74c3c" if d < 0 else "#2ecc71" for d in order["F1 Diff"]]
            ax3.barh(order["Modulation"], order["F1 Diff"], color=colors, alpha=0.8)
            ax3.axvline(0, color="k", linewidth=0.8)
        ax3.set_xlabel("F1 Diff (Transformer - ViT, %)")
        ax3.set_title("Per-Class F1 Difference", fontweight="bold")
        # (4) better/worse/equal pie (ref: compare_models.py:309-329)
        ax4 = axes[1, 1]
        if not df.empty:
            better = int((df["F1 Diff"] > 0).sum())
            worse = int((df["F1 Diff"] < 0).sum())
            equal = int((df["F1 Diff"] == 0).sum())
            ax4.pie([better, worse, equal], labels=["Better", "Worse", "Equal"],
                    autopct="%1.1f%%", colors=["#2ecc71", "#e74c3c", "#95a5a6"],
                    startangle=90)
        ax4.set_title("Transformer vs ViT\n(F1-Score Comparison by Class)",
                      fontweight="bold", fontsize=12)
        fig.tight_layout()
        fig.savefig(self.output_dir / "overall_comparison.png", dpi=300,
                    bbox_inches="tight")
        plt.close(fig)

    # ---- report ----------------------------------------------------------
    def generate_report(self, verbose: bool = True) -> Dict:
        summary_df = self.create_summary_table()
        summary_df.to_csv(self.output_dir / "summary_comparison.csv", index=False)
        detailed_df = self.create_detailed_comparison_table()
        detailed_df.to_csv(self.output_dir / "detailed_comparison.csv", index=False)

        insights: Dict = {
            "overall_improvement":
                self.transformer_parser.overall_accuracy - self.vit_parser.overall_accuracy,
            "snr_improvements": {
                snr: self.transformer_parser.snr_accuracies.get(snr, 0)
                - self.vit_parser.snr_accuracies[snr]
                for snr in sorted(self.vit_parser.snr_accuracies)
            },
        }
        if not detailed_df.empty:
            ordered = detailed_df.sort_values("F1 Diff", ascending=False)
            insights["top_improved"] = list(
                ordered.head(3)[["Modulation", "F1 Diff"]].itertuples(index=False, name=None)
            )
            insights["top_degraded"] = list(
                ordered.tail(3)[["Modulation", "F1 Diff"]].itertuples(index=False, name=None)
            )
        if verbose:
            print("=" * 80)
            print("AUTOMATIC MODULATION CLASSIFICATION - MODEL COMPARISON")
            print("=" * 80)
            print(summary_df.to_string(index=False))
            print(f"\n1. Overall Accuracy Improvement: {insights['overall_improvement']:+.2f}%")
            for snr, diff in insights["snr_improvements"].items():
                print(f"2. SNR {snr:+d} dB Improvement: {diff:+.2f}%")
            if "top_improved" in insights:
                print("\n3. Top 3 Improved Modulations (F1-Score):")
                for name, diff in insights["top_improved"]:
                    print(f"   - {name}: {diff:+.2f}%")
                print("\n4. Top 3 Degraded Modulations (F1-Score):")
                for name, diff in insights["top_degraded"]:
                    print(f"   - {name}: {diff:+.2f}%")
        return insights

    def run_comparison(self, verbose: bool = True) -> Dict:
        insights = self.generate_report(verbose=verbose)
        self.plot_overall_comparison()
        self.plot_snr_comparison()
        self.plot_per_class_metrics()
        self.plot_f1_difference_heatmap()
        return insights

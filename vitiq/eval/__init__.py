from vitiq.eval.report import (  # noqa: F401
    ClassificationReportParser,
    write_classification_report,
)
from vitiq.eval.evaluate import evaluate_model_with_confusion  # noqa: F401
from vitiq.eval.compare import ModelComparison  # noqa: F401

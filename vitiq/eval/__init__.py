from vitiq.eval.report import (  # noqa: F401
    ClassificationReportParser,
    write_classification_report,
)
from vitiq.eval.evaluate import (  # noqa: F401
    confusion_artifacts,
    evaluate_feed_with_confusion,
    evaluate_model_with_confusion,
    predict_feed,
)
from vitiq.eval.compare import ModelComparison  # noqa: F401

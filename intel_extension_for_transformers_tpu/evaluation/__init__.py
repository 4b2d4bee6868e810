from intel_extension_for_transformers_tpu.evaluation.harness import (
    evaluate_multiple_choice,
    evaluate_perplexity,
    loglikelihood,
)
from intel_extension_for_transformers_tpu.evaluation import synthetic as _synthetic  # noqa: F401  (registers synthetic_* tasks)
from intel_extension_for_transformers_tpu.evaluation.tasks import (
    GreedyContinuationTask,
    MultipleChoiceTask,
    PerplexityTask,
    Task,
    evaluate,
    get_task,
    list_tasks,
    register_task,
)

__all__ = [
    "evaluate_multiple_choice",
    "evaluate_perplexity",
    "loglikelihood",
    "evaluate",
    "get_task",
    "list_tasks",
    "register_task",
    "Task",
    "MultipleChoiceTask",
    "GreedyContinuationTask",
    "PerplexityTask",
]

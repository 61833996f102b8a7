from diffews_tpu.evaluation.evaluator import Evaluator  # noqa: F401
from diffews_tpu.evaluation.meter import AverageMeter, EvalLogger  # noqa: F401

from . import metrics, records, trainer, checkpoint

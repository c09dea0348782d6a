from ref_geotransformer_tpu.utils.average_meter import AverageMeter
from ref_geotransformer_tpu.utils.summary_board import SummaryBoard
from ref_geotransformer_tpu.utils.timer import Timer, TimerDict
from ref_geotransformer_tpu.utils.logger import Logger
from ref_geotransformer_tpu.utils.common import (
    ensure_dir,
    load_pickle,
    dump_pickle,
    get_log_string,
    get_print_format,
)

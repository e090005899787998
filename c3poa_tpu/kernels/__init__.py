from .sw_profile import start_profile_batch
from .smooth import smooth3_batch
from .peaks import call_peaks_batch
from .banded import banded_align_batch

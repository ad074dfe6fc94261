from uniter_tpu.data.txt_db import TxtDb, TxtTokDb, write_txt_db  # noqa: F401
from uniter_tpu.data.img_db import DetectFeatDb, write_img_db  # noqa: F401

from lsdradixsort_tpu.core import digits, datagen, timing, roofline  # noqa: F401

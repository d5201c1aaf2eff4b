"""Method-name constants kept for API parity with the reference's
deprecated ``Options`` aliases (`__init__.py:54-68`)."""


class TempOptions:
    SINE_MIN_MAX = "sine_min_max"
    SINE_MEAN = "sine_mean"
    SINE = "sine"
    MEAN_COURSE_MIN_MAX = "mean_course_min_max"
    MEAN_COURSE_MEAN = "mean_course_mean"


class HumOptions:
    EQUAL = "equal"
    MINIMAL = "minimal"
    DEWPOINT_REGRESSION = "dewpoint_regression"
    MIN_MAX = "min_max"
    LINEAR_DEWPOINT_VARIATION = "linear_dewpoint_variation"
    MONTH_HOUR_PRECIP_MEAN = "month_hour_precip_mean"


class WindOptions:
    EQUAL = "equal"
    COSINE = "cosine"
    RANDOM = "random"


class RadOptions:
    POT_RAD = "pot_rad"
    POT_RAD_VIA_SSD = "pot_rad_via_ssd"
    POT_RAD_VIA_BC = "pot_rad_via_bc"
    MEAN_COURSE = "mean_course"


class PrecipOptions:
    EQUAL = "equal"
    CASCADE = "cascade"
    MASTERSTATION = "masterstation"

from infinicube_tpu.models.gsm.model import GSM, GSMConfig  # noqa: F401

from . import accountant, dpsgd

from . import dp

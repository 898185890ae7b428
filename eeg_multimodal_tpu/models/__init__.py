from . import layers, bert, fusion

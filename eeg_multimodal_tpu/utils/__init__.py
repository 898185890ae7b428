from .seeding import set_seed, key_chain
from .trees import tree_size, tree_partition, tree_merge

from .coders import BasePointBBoxCoder
from . import losses

from .inference import ModelInference, init_template, load_variables, model_from_variables
from .pipeline import Pipeline

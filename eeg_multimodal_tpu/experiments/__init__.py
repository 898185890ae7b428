from .drivers import (
    Demo,
    CompareModal,
    ComparePrivacyBudget,
    ComparePrivateScheme,
    CompareModelInitWeight,
    CompareCrossModalType,
)
